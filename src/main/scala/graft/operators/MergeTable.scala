package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed copy-on-write MERGE over a bucket-clustered parquet table —
  * the lakehouse upsert/delete primitive (Delta/Hudi's copy-on-write
  * shape) built from plain parquet + the same rename-aside swap
  * discipline as [[AnnIndex]]/[[DedupIndex]]'s lifecycles. The
  * reference's only mutation story is whole-file rewrite of flat
  * tables (e.g. the per-run overwrite in its Makefile-driven outputs);
  * at 100 TB a CDC batch must touch only the data it changes:
  *
  *  - **layout**: rows land partitioned by `bucket = pmod(xxhash64(key),
  *    nBuckets)` — a deterministic hash clustering, so every key lives
  *    in exactly one directory;
  *  - **merge**: the changed keys' buckets are computed first (a
  *    distinct over the — batch-sized — change set); ONLY those
  *    bucket directories are scanned (partition pruning, asserted in
  *    MergeTableSpec), survivors are anti-joined against the changed
  *    keys (AQE broadcasts the batch when small), upserts unioned in,
  *    and the rewrite lands bucket-by-bucket via rename-aside: nothing
  *    live is destroyed until its replacement committed, a crash
  *    leaves the displaced originals under `data_trash/` (recovery:
  *    rename back), and every rename is `require`d;
  *  - **semantics**: upsert = replace-by-key or insert; delete =
  *    remove-by-key (absent keys are no-ops). A batch must not upsert
  *    the same key twice nor both upsert and delete one key — rejected
  *    loudly rather than resolved by an arbitrary winner.
  *
  * Cost ∝ (affected buckets' data + change batch), never table size;
  * the unchanged buckets are byte-identical (law in MergeTableSpec).
  */
object MergeTable {

  private def dataPath(dir: String) = s"$dir/data"
  private def metaPath(dir: String) = s"$dir/meta"

  private def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets)).cast("int")

  /** Land `df` as a bucket-clustered merge table at `dir`. `keyCol`
    * must be unique (checked — one action over the batch). */
  def create(df: DataFrame, dir: String, keyCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    requireUniqueKeys(df, keyCol, "create")
    df.withColumn("bucket", bucketOf(col(keyCol), nBuckets))
      .write.partitionBy("bucket").mode("overwrite").parquet(dataPath(dir))
    import spark.implicits._
    Seq((keyCol, nBuckets)).toDF("key_col", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(dir))
  }

  /** The table's current content (data columns only — the bucket is
    * an internal layout column). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dataPath(dir)).drop("bucket")

  private def meta(spark: SparkSession, dir: String): (String, Int) = {
    val r = spark.read.parquet(metaPath(dir)).head()
    (r.getString(0), r.getInt(1))
  }

  private def requireUniqueKeys(df: DataFrame, keyCol: String,
      who: String): Unit = {
    val dup = df.groupBy(col(keyCol)).count().where(col("count") > 1)
      .limit(5).collect()
    require(dup.isEmpty,
      s"$who: duplicate keys in batch — ${dup.map(_.get(0)).mkString(", ")}" +
        " (a merge batch must resolve its own conflicts; an arbitrary" +
        " last-writer would be nondeterministic under shuffles)")
  }

  /** Apply one CDC batch: `upserts` (full rows, replace-or-insert by
    * key) and `deleteKeys` (single-column frame of keys to remove).
    * Only the buckets containing touched keys are rewritten. */
  def merge(spark: SparkSession, dir: String, upserts: DataFrame,
      deleteKeys: DataFrame): Unit = {
    val (keyCol, nBuckets) = meta(spark, dir)
    requireUniqueKeys(upserts, keyCol, "merge")
    val delK = deleteKeys.select(col(deleteKeys.columns.head).as(keyCol))
    val upK = upserts.select(col(keyCol))
    val both = upK.join(delK, keyCol).limit(5).collect()
    require(both.isEmpty,
      s"merge: keys both upserted and deleted — ${both.map(_.get(0)).mkString(", ")}")
    // changed keys with their buckets; affected bucket ids are a
    // bounded collect (≤ nBuckets ints, never data-sized)
    val changed = upK.union(delK)
      .withColumn("bucket", bucketOf(col(keyCol), nBuckets))
    val affected = changed.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (affected.isEmpty) return
    val live = spark.read.parquet(dataPath(dir))
    // partition-pruned scan of the affected buckets only; the
    // anti-join drops every touched key (its replacement — if any —
    // arrives from the upsert batch)
    val survivors = live
      .where(col("bucket").isin(affected.map(Integer.valueOf): _*))
      .join(changed.select(keyCol), Seq(keyCol), "left_anti")
    val rewrite = survivors.unionByName(
      upserts.withColumn("bucket", bucketOf(col(keyCol), nBuckets)))
    val tmp = s"$dir/data_rewrite"
    rewrite.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
    // rename-aside swap (the AnnIndex.delete idiom): move each live
    // bucket to trash, then install its rewrite; a bucket whose rows
    // were all deleted has no rewritten dir and is dropped whole; a
    // bucket new to this batch has no live dir to displace
    val root = new org.apache.hadoop.fs.Path(dataPath(dir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trash = new org.apache.hadoop.fs.Path(s"$dir/data_trash")
    fs.delete(trash, true)
    fs.mkdirs(trash)
    affected.foreach { b =>
      val liveB = new org.apache.hadoop.fs.Path(root, s"bucket=$b")
      val freshB = new org.apache.hadoop.fs.Path(tmp, s"bucket=$b")
      if (fs.exists(liveB))
        require(fs.rename(liveB, new org.apache.hadoop.fs.Path(trash, s"bucket=$b")),
          s"could not move bucket=$b aside — merge aborted with the table intact")
      if (fs.exists(freshB))
        require(fs.rename(freshB, liveB),
          s"could not install rewritten bucket=$b — its prior content is" +
            s" under $trash")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.delete(trash, true)
  }

  /** Recompute-from-scratch reference form of [[merge]] — law twin
    * (MergeTableSpec): full-table anti-join + union, no bucket
    * pruning. */
  private[graft] def mergeBrute(base: DataFrame, keyCol: String,
      upserts: DataFrame, deleteKeys: DataFrame): DataFrame = {
    val delK = deleteKeys.select(col(deleteKeys.columns.head).as(keyCol))
    val changed = upserts.select(col(keyCol)).union(delK)
    base.join(changed, Seq(keyCol), "left_anti").unionByName(upserts)
  }
}
