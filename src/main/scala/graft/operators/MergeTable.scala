package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed copy-on-write MERGE over a bucket-clustered parquet table —
  * the lakehouse upsert/delete primitive (Delta/Hudi's copy-on-write
  * shape) as a minimal GENERATION + MANIFEST log over plain parquet:
  *
  *  - **layout**: rows land under `data/gen=G/bucket=B` where
  *    `bucket = pmod(xxhash64(key), nBuckets)`; a MANIFEST (parquet,
  *    one row per bucket → generation) names the live generation of
  *    every bucket. Manifests are versioned files
  *    (`manifest/v%06d`), committed by a tmp-write + rename to a
  *    path that NEVER existed — the one atomic step; readers take
  *    the highest version.
  *  - **merge**: the changed keys' buckets are computed first (a
  *    distinct over the batch-sized change set); ONLY those buckets'
  *    live files are read (path-selected from the manifest — the
  *    planning-time analog of partition pruning), survivors are
  *    anti-joined against the changed keys (AQE broadcasts the batch
  *    when small), upserts unioned in, and the result lands under
  *    the NEXT generation. Nothing is ever deleted or moved: a crash
  *    anywhere leaves either the old manifest (orphan data files,
  *    invisible to every reader, reclaimed by [[vacuum]]) or the new
  *    one (merge complete). No undo log, no recovery procedure —
  *    "crash-safe" is a property of the layout, not a protocol.
  *  - **idempotent replay**: re-merging the same batch against the
  *    post-merge table reproduces the same content (upserts
  *    overwrite themselves, deletes of absent keys are no-ops), so a
  *    streaming CDC apply gets exactly-once CONTENT from the
  *    checkpoint WAL alone ([[graft.streaming.StreamOps
  *    .runMergeStream]]; law in MergeTableSpec).
  *  - **semantics**: upsert = replace-by-key or insert; delete =
  *    remove-by-key (absent keys are no-ops). A batch must not
  *    upsert the same key twice nor both upsert and delete one key —
  *    rejected loudly rather than resolved by an arbitrary winner.
  *
  * Merge cost ∝ (affected buckets' data + change batch), never table
  * size; untouched buckets' files are not even opened, and their
  * generations carry over byte-identical (laws in MergeTableSpec).
  * Single-writer by design (the reference's pipelines are
  * single-writer Makefile stages; multi-writer commit arbitration is
  * a lock service concern, out of scope).
  */
object MergeTable {

  private def dataPath(dir: String) = s"$dir/data"
  private def metaPath(dir: String) = s"$dir/meta"
  private def manifestDir(dir: String) = s"$dir/manifest"

  private def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets)).cast("int")

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed manifest version (0 = none). */
  private def currentVersion(spark: SparkSession, dir: String): Int = {
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    val f = fs(spark, dir)
    if (!f.exists(md)) return 0
    f.listStatus(md).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toInt)
      .foldLeft(0)(math.max)
  }

  /** One committed version: its live (bucket → gen) map and its DATA
    * schema. The schema travels IN the manifest file, so a schema
    * evolution commits atomically with the data it describes, time
    * travel reads each version under its OWN schema, and readers
    * never pay a mergeSchema footer sweep — the declared schema fills
    * columns absent from pre-evolution files with NULL. */
  private[graft] case class Snapshot(buckets: Map[Int, Int],
      schema: org.apache.spark.sql.types.StructType)

  /** The snapshot of the highest manifest version. */
  private def manifest(spark: SparkSession, dir: String): Snapshot = {
    val v = currentVersion(spark, dir)
    require(v > 0, s"no committed manifest under $dir")
    manifestAt(spark, dir, v)
  }

  /** The snapshot of a specific committed version. */
  private def manifestAt(spark: SparkSession, dir: String, v: Int): Snapshot = {
    val p = new org.apache.hadoop.fs.Path(f"${manifestDir(dir)}/v$v%06d")
    require(fs(spark, dir).exists(p),
      s"manifest version $v does not exist under $dir — never committed, or reclaimed by vacuum")
    val rows = spark.read.parquet(p.toString).collect()
    // the bucket = -1 sentinel row carries the schema (present even
    // when every bucket was deleted)
    Snapshot(rows.filter(_.getInt(0) >= 0)
        .map(r => r.getInt(0) -> r.getInt(1)).toMap,
      org.apache.spark.sql.types.DataType.fromJson(
          rows.find(_.getInt(0) == -1).get.getString(2))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** All committed manifest versions, ascending (time-travel points).
    * Version 1 is the create; each merge commits the next. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    val f = fs(spark, dir)
    if (!f.exists(md)) return Seq.empty
    f.listStatus(md).map(_.getPath.getName).toSeq
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).sorted
  }

  /** Write (bucket, gen, schema_json) rows as version `v` — tmp then
    * rename to a never-before-existing path: the commit point. The
    * schema rides in a bucket = -1 sentinel row, so it versions
    * atomically with the bucket map it describes. */
  private def commitManifest(spark: SparkSession, dir: String,
      entries: Map[Int, Int], v: Int,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import spark.implicits._
    val tmp = f"${manifestDir(dir)}/tmp-v$v%06d"
    val sj = schema.json
    ((-1, -1) +: entries.toSeq.sortBy(_._1))
      .map { case (b, g) => (b, g, sj) }
      .toDF("bucket", "gen", "schema_json")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val f0 = fs(spark, dir)
    val dst = new org.apache.hadoop.fs.Path(f"${manifestDir(dir)}/v$v%06d")
    require(!f0.exists(dst), s"manifest $dst already exists — concurrent writer?")
    require(f0.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"could not commit manifest $dst")
  }

  private def bucketPaths(dir: String, m: Map[Int, Int],
      buckets: Seq[Int]): Seq[String] =
    buckets.flatMap(b => m.get(b).map(g => s"${dataPath(dir)}/gen=$g/bucket=$b"))

  /** Land `df` as a bucket-clustered merge table at `dir`. `keyCol`
    * must be unique (checked — one action over the batch).
    *
    * `clusterBy` + `statsCols` turn the table into a CLUSTERED merge
    * table: every generation is locally sorted by `clusterBy` inside
    * each bucket (split into runs by `maxRecordsPerFile`), and a
    * per-generation `_zonemap` sidecar (footer-harvested, [[graft
    * .sources.ZoneMap]]) carries `statsCols` min/max per file — so
    * [[readRange]] opens only files whose zone intersects. The
    * add-only layout makes sidecars maintenance-free: files are
    * never rewritten, so a generation's sidecar is valid forever;
    * carried-over generations keep their (already tight) zones. */
  def create(df: DataFrame, dir: String, keyCol: String,
      nBuckets: Int, clusterBy: Option[String] = None,
      statsCols: Seq[String] = Nil, maxRecordsPerFile: Long = 0L): Unit = {
    val spark = df.sparkSession
    requireUniqueKeys(df, keyCol, "create")
    writeGen(spark, dir, df.withColumn("bucket", bucketOf(col(keyCol), nBuckets)),
      0, clusterBy, statsCols, maxRecordsPerFile)
    import spark.implicits._
    Seq((keyCol, nBuckets, clusterBy.getOrElse(""), statsCols.mkString(","),
        maxRecordsPerFile))
      .toDF("key_col", "n_buckets", "cluster_by", "stats_cols", "max_records")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(dir))
    // only buckets that actually received rows enter the manifest
    commitManifest(spark, dir, writtenBuckets(spark, dir, 0).map(_ -> 0).toMap,
      1, asNullable(df.schema))
  }

  private def writtenBuckets(spark: SparkSession, dir: String,
      gen: Int): Seq[Int] =
    fs(spark, dir)
      .listStatus(new org.apache.hadoop.fs.Path(s"${dataPath(dir)}/gen=$gen"))
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).toSeq

  /** One generation's write: optional within-bucket cluster sort
    * (repartition on the bucket id so each bucket's rows sort as one
    * run; `maxRecordsPerFile` then splits the run into consecutive —
    * therefore zone-disjoint — files) + optional footer-harvested
    * sidecar at `gen=G/_zonemap`. */
  private def writeGen(spark: SparkSession, dir: String, df: DataFrame,
      gen: Int, clusterBy: Option[String], statsCols: Seq[String],
      maxRecordsPerFile: Long): Unit = {
    val genPath = s"${dataPath(dir)}/gen=$gen"
    val sorted = clusterBy.fold(df)(c =>
      df.repartition(col("bucket")).sortWithinPartitions(col("bucket"), col(c)))
    val w = sorted.write.partitionBy("bucket").mode("overwrite")
    (if (maxRecordsPerFile > 0L) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(genPath)
    if (statsCols.nonEmpty) {
      val f0 = fs(spark, dir)
      val files = f0.listStatus(new org.apache.hadoop.fs.Path(genPath))
        .filter(_.getPath.getName.startsWith("bucket=")).flatMap(b =>
          f0.listStatus(b.getPath).filter(_.getPath.getName.endsWith(".parquet"))
            .map(s => s"${b.getPath.getName}/${s.getPath.getName}" ->
              s.getPath.toString)).toSeq.sortBy(_._1)
      graft.sources.ZoneMap.writeFilesAt(spark, s"$genPath/_zonemap",
        files, statsCols)
    }
  }

  /** The table's current content (data columns only). */
  def read(spark: SparkSession, dir: String): DataFrame =
    readManifest(spark, dir, manifest(spark, dir))

  /** TIME TRAVEL — the table's content as of committed manifest
    * version `v` (1 = as created; each merge commits the next).
    * Free by construction: merges only ever ADD files, so every
    * bucket generation an old manifest names is still on disk until
    * [[vacuum]] reclaims superseded versions (after which readAt of
    * a reclaimed version fails loudly, the documented trade). */
  def readAt(spark: SparkSession, dir: String, v: Int): DataFrame =
    readManifest(spark, dir, manifestAt(spark, dir, v))

  private def readManifest(spark: SparkSession, dir: String,
      snap: Snapshot): DataFrame = {
    val paths = bucketPaths(dir, snap.buckets, snap.buckets.keys.toSeq.sorted)
    if (paths.isEmpty)
      // all buckets deleted: an empty frame with the version's schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    // the version's DECLARED schema: columns added by a later schema
    // evolution read as NULL from pre-evolution files, and old
    // versions read under their own (narrower) historical schema
    else spark.read.schema(snap.schema).parquet(paths: _*)
  }

  private def asNullable(st: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(st.fields.map(_.copy(nullable = true)))

  /** Keyed point read — the serving-path counterpart of [[merge]]'s
    * write-side pruning: hash the probe keys to their buckets, read
    * ONLY those buckets' live files (path-selected from the
    * manifest), and semi-join. Cost ∝ (probed buckets' data + key
    * set), never table size; the bucket-id collect is bounded by
    * nBuckets, and AQE broadcasts the key set when small. */
  def lookup(spark: SparkSession, dir: String, keys: DataFrame): DataFrame = {
    val (keyCol, k, paths) = lookupPaths(spark, dir, keys)
    if (paths.isEmpty) readManifest(spark, dir, manifest(spark, dir)).limit(0)
    else spark.read.schema(manifest(spark, dir).schema).parquet(paths: _*)
      .join(k, Seq(keyCol), "left_semi")
  }

  /** The bucket paths a [[lookup]] of `keys` opens — exposed so the
    * path-pruning law is assertable (MergeTableSpec). */
  private[graft] def lookupPaths(spark: SparkSession, dir: String,
      keys: DataFrame): (String, DataFrame, Seq[String]) = {
    val m0 = meta(spark, dir)
    val k = keys.select(col(keys.columns.head).as(m0.keyCol)).distinct()
    val probed = k.withColumn("bucket", bucketOf(col(m0.keyCol), m0.nBuckets))
      .select("bucket").distinct().collect().map(_.getInt(0)).sorted
    (m0.keyCol, k, bucketPaths(dir, manifest(spark, dir).buckets, probed.toSeq))
  }

  private case class Meta(keyCol: String, nBuckets: Int,
      clusterBy: Option[String], statsCols: Seq[String], maxRecords: Long)

  private def meta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(metaPath(dir)).head()
    Meta(r.getString(0), r.getInt(1),
      Option(r.getString(2)).filter(_.nonEmpty),
      Option(r.getString(3)).filter(_.nonEmpty)
        .map(_.split(",").toSeq).getOrElse(Nil),
      r.getLong(4))
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
    * Only the buckets containing touched keys are read or written.
    *
    * SCHEMA EVOLUTION: with `evolveSchema = true` the batch may ADD
    * columns (appended to the schema, NULL in every pre-evolution
    * row) and OMIT existing non-key columns (NULL in the upserted
    * rows). The widened schema commits atomically with the manifest
    * version it describes (the sentinel row in [[commitManifest]]),
    * so a crash can never publish a schema without its data or vice
    * versa, and time travel reads each version under its own schema.
    * Shared columns must keep their type; dropping or retyping a
    * column is not supported (a rewrite, not a merge). Without the
    * flag, any column-set mismatch fails loudly. */
  def merge(spark: SparkSession, dir: String, upserts: DataFrame,
      deleteKeys: DataFrame, evolveSchema: Boolean = false): Unit = {
    val m0 = meta(spark, dir)
    val (keyCol, nBuckets) = (m0.keyCol, m0.nBuckets)
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
    val snap = manifest(spark, dir)
    val cur = snap.schema
    val upSchema = asNullable(upserts.schema)
    cur.fields.filter(f => upSchema.fieldNames.contains(f.name)).foreach { f =>
      require(upSchema(f.name).dataType == f.dataType,
        s"merge: column ${f.name} is ${f.dataType} in the table but " +
          s"${upSchema(f.name).dataType} in the batch — retyping needs a rewrite")
    }
    val added = upSchema.fields.filterNot(f => cur.fieldNames.contains(f.name))
    val missing = cur.fieldNames.filterNot(upSchema.fieldNames.contains)
    if (!evolveSchema)
      require(added.isEmpty && missing.isEmpty,
        s"merge: batch schema differs from the table's (adds " +
          s"[${added.map(_.name).mkString(",")}], omits " +
          s"[${missing.mkString(",")}]) — pass evolveSchema = true to widen")
    require(!missing.contains(keyCol), s"merge: batch must carry key $keyCol")
    val nextSchema = org.apache.spark.sql.types.StructType(cur.fields ++ added)
    val livePaths = bucketPaths(dir, snap.buckets, affected.toSeq)
    val nextGen = currentVersion(spark, dir) // gen numbers track versions
    // leaf-dir reads carry data columns only (bucket lives in the dir
    // name) — recompute it once over the whole rewrite frame. Reads
    // DECLARE the current schema: pre-evolution files fill added
    // columns with NULL
    val survivors =
      if (livePaths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cur)
      else spark.read.schema(cur).parquet(livePaths: _*)
        .join(changed.select(keyCol), Seq(keyCol), "left_anti")
    writeGen(spark, dir,
      survivors.unionByName(upserts, allowMissingColumns = true)
        .select(nextSchema.fieldNames.map(col): _*)
        .withColumn("bucket", bucketOf(col(keyCol), nBuckets)),
      nextGen, m0.clusterBy, m0.statsCols, m0.maxRecords)
    // manifest: affected buckets move to nextGen (or leave — a bucket
    // whose rows were all deleted writes no dir and drops out);
    // untouched buckets carry their generation over verbatim
    val written = writtenBuckets(spark, dir, nextGen).toSet
    val next = (snap.buckets -- affected.toSet) ++
      affected.filter(written).map(_ -> nextGen)
    commitManifest(spark, dir, next, nextGen + 1, nextSchema)
  }

  /** Range read over the cluster column (or any stats column): for
    * every live (bucket, generation) the manifest names, consult that
    * generation's `_zonemap` sidecar and open ONLY files whose zone
    * intersects `[lo, hi]` — manifest path selection and file-level
    * data skipping composed. Generations written before a bucket was
    * last touched keep serving their original (still valid — files
    * are never rewritten) zones. The exact predicate is re-applied. */
  def readRange(spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): DataFrame = {
    val paths = rangePaths(spark, dir, c, lo, hi)
    if (paths.isEmpty) read(spark, dir).where(lit(false))
    else spark.read.schema(manifest(spark, dir).schema).parquet(paths: _*)
      .where(col(c).between(lo, hi))
  }

  /** The file paths a [[readRange]] opens — exposed for the pruning
    * law (MergeTableSpec). */
  private[graft] def rangePaths(spark: SparkSession, dir: String,
      c: String, lo: Long, hi: Long): Seq[String] = {
    require(meta(spark, dir).statsCols.contains(c),
      s"$c is not a stats column of the merge table at $dir")
    val m = manifest(spark, dir).buckets
    m.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (g, entries) =>
      val genPath = s"${dataPath(dir)}/gen=$g"
      val zm = spark.read.parquet(s"$genPath/_zonemap")
      val live = entries.keys.map(b => s"bucket=$b/").toSet
      graft.sources.ZoneMap.keptOf(zm, c, lo, hi)
        .filter(f => live.exists(f.startsWith))
        .map(f => s"$genPath/$f")
    }
  }

  /** Reclaim every data file no committed-current manifest references
    * and every superseded manifest version — the cleanup for crashed
    * merges' orphans and old generations. Readers of the CURRENT
    * manifest are unaffected; readers pinned to an older version
    * lose time travel (the documented trade). */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val f0 = fs(spark, dir)
    val v = currentVersion(spark, dir)
    val m = manifest(spark, dir).buckets
    val live = m.map { case (b, g) => s"gen=$g/bucket=$b" }.toSet
    val dataRoot = new org.apache.hadoop.fs.Path(dataPath(dir))
    if (f0.exists(dataRoot)) f0.listStatus(dataRoot).foreach { genDir =>
      val gen = genDir.getPath.getName
      f0.listStatus(genDir.getPath).foreach { bDir =>
        val name = bDir.getPath.getName
        if (name.startsWith("bucket=") && !live.contains(s"$gen/$name"))
          require(f0.delete(bDir.getPath, true), s"could not vacuum $bDir")
      }
      if (f0.listStatus(genDir.getPath)
          .forall(s => s.getPath.getName.startsWith("_")))
        f0.delete(genDir.getPath, true)
    }
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    f0.listStatus(md).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("tmp-") ||
          (n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toInt < v))
        f0.delete(p, true)
    }
  }

  /** CHANGE DATA FEED — the row-level difference between two
    * committed versions, for incremental consumers ("give me
    * everything that changed since I last read"), with Delta-CDF
    * mode semantics: `insert` (new key, new image),
    * `update_preimage`/`update_postimage` (existing key whose row
    * changed — BOTH images, so a downstream aggregate maintains
    * itself by `+post −pre +insert −delete` without rescanning), and
    * `delete` (old image). An upsert that rewrites an identical row
    * is not a change. Reads ONLY buckets whose generation moved
    * between the two manifests — cost ∝ changed data, never table
    * size — which the add-only layout makes exact: an untouched
    * bucket's generation is carried verbatim, so generation equality
    * IS content equality (byte-identity law in MergeTableSpec).
    * Readable until [[vacuum]] reclaims `fromV`. */
  def changes(spark: SparkSession, dir: String, fromV: Int,
      toV: Int): DataFrame = {
    require(fromV < toV, s"changes: need fromV < toV, got $fromV >= $toV")
    val keyCol = meta(spark, dir).keyCol
    val sFrom = manifestAt(spark, dir, fromV)
    val sTo = manifestAt(spark, dir, toV)
    val moved = (sFrom.buckets.keySet ++ sTo.buckets.keySet)
      .filter(b => sFrom.buckets.get(b) != sTo.buckets.get(b)).toSeq.sorted
    // both slices read under the TO version's (widest) schema, so a
    // feed across a schema evolution compares like with like — a
    // pre-evolution row carries NULL in the added columns
    def slice(m: Map[Int, Int]): DataFrame = {
      val paths = bucketPaths(dir, m.view.filterKeys(moved.contains).toMap,
        moved)
      if (paths.isEmpty) readManifest(spark, dir, sTo).limit(0)
      else spark.read.schema(sTo.schema).parquet(paths: _*)
    }
    val oldRows = slice(sFrom.buckets)
    val newRows = slice(sTo.buckets)
    // keys unique per version: full-row EXCEPT isolates changed rows
    // on each side; the key split then separates insert/update/delete
    val changedNew = newRows.exceptAll(oldRows)
    val changedOld = oldRows.exceptAll(newRows)
    val oldKeys = oldRows.select(keyCol)
    val newKeys = newRows.select(keyCol)
    changedNew.join(oldKeys, Seq(keyCol), "left_anti")
      .withColumn("change", lit("insert"))
      .unionByName(changedNew.join(oldKeys, Seq(keyCol), "left_semi")
        .withColumn("change", lit("update_postimage")))
      .unionByName(changedOld.join(newKeys, Seq(keyCol), "left_semi")
        .withColumn("change", lit("update_preimage")))
      .unionByName(changedOld.join(newKeys, Seq(keyCol), "left_anti")
        .withColumn("change", lit("delete")))
  }

  /** DECLARATIVE merge table: a DataFrame over the live manifest
    * whose scan prunes at planning time from WHATEVER predicate
    * Catalyst pushes down — no special read API, SQL views included:
    *
    *  - key equality / IN prunes BUCKETS (the probe values hash
    *    driver-side with the same `pmod(xxhash64(k), n)` the layout
    *    uses, so `WHERE k = 42` opens one bucket);
    *  - stats-column predicates prune FILES via the per-generation
    *    `_zonemap` zones (clustered tables);
    *  - everything else scans the live files and filters exactly.
    *
    * The file set is pinned at construction — a SNAPSHOT of the
    * manifest current at that moment (MVCC semantics for free from
    * the add-only layout): merges committed later are not seen, and
    * the snapshot stays readable until [[vacuum]]. */
  def table(spark: SparkSession, dir: String): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(
      spark, tablePlan(spark, dir))

  /** The bare LogicalRelation behind [[table]] — also the body of the
    * `graft_merge_table('<dir>')` SQL table function
    * ([[graft.functions.GraftExtensions]]). */
  private[graft] def tablePlan(spark: SparkSession, dir: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val idx = new TableFileIndex(spark, dir)
    val rel = HadoopFsRelation(idx, new org.apache.spark.sql.types.StructType(),
      idx.dataSchema, None, new ParquetFileFormat, Map.empty)(spark)
    LogicalRelation(rel, isStreaming = false)
  }

  /** [[table]]'s scan-time pruner. */
  private class TableFileIndex(spark: SparkSession, dir: String)
      extends org.apache.spark.sql.execution.datasources.FileIndex {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.execution.datasources.PartitionDirectory
    import graft.sources.ZonePrune

    private val m0 = meta(spark, dir)
    private val snap = manifest(spark, dir)
    private val man = snap.buckets
    private val f0 = fs(spark, dir)

    /** the pinned snapshot's schema — [[tablePlan]] declares it */
    private[MergeTable] def dataSchema = snap.schema

    private val keyType: org.apache.spark.sql.types.DataType =
      snap.schema(m0.keyCol).dataType

    /** (bucket, FileStatus, zone-by-column) for every live file. */
    private val files: Seq[(Int, org.apache.hadoop.fs.FileStatus,
        Map[String, ZonePrune.Zone])] = {
      val zonesByGen: Map[Int, Map[String, Map[String, ZonePrune.Zone]]] =
        if (m0.statsCols.isEmpty) Map.empty
        else man.values.toSet.toSeq.map { (g: Int) =>
          g -> ZonePrune.zonesOf(
            spark.read.parquet(s"${dataPath(dir)}/gen=$g/_zonemap"))
        }.toMap
      man.toSeq.sortBy(_._1).flatMap { case (b, g) =>
        val bp = new org.apache.hadoop.fs.Path(
          s"${dataPath(dir)}/gen=$g/bucket=$b")
        f0.listStatus(bp).filter(_.getPath.getName.endsWith(".parquet"))
          .toSeq.sortBy(_.getPath.getName).map { st =>
            val zone = zonesByGen.get(g)
              .flatMap(_.get(s"bucket=$b/${st.getPath.getName}"))
              .getOrElse(Map.empty[String, ZonePrune.Zone])
            (b, st, zone)
          }
      }
    }

    private def bucketOfValue(v: Any): Option[Int] = {
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      import org.apache.spark.sql.types._
      val h = keyType match {
        case LongType    => v match {
          case l: Long => Some(XxHash64Function.hash(l, LongType, 42L))
          case _ => None
        }
        case IntegerType => v match {
          // demands() widens int literals to Long; the layout hashed
          // the column's own (int) type, so hash the int value back
          case l: Long if l.isValidInt =>
            Some(XxHash64Function.hash(l.toInt, IntegerType, 42L))
          case _ => None
        }
        case StringType  => v match {
          case s: String => Some(XxHash64Function.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(s),
            StringType, 42L))
          case _ => None
        }
        case _ => None
      }
      h.map(x => (((x % m0.nBuckets) + m0.nBuckets) % m0.nBuckets).toInt)
    }

    override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
      Seq(new org.apache.hadoop.fs.Path(dataPath(dir)))
    override def partitionSchema = new org.apache.spark.sql.types.StructType()
    override def sizeInBytes: Long = files.map(_._2.getLen).sum
    override def inputFiles: Array[String] =
      files.map(_._2.getPath.toString).toArray
    override def refresh(): Unit = () // a snapshot, by design

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val d = ZonePrune.demands(dataFilters)
      // key equality/IN → the only buckets those values can live in;
      // a value the layout's hash can't reproduce disables the prune
      val keyVals: Option[Set[Any]] =
        d.eqLong.get(m0.keyCol).map(_.map(v => v: Any))
          .orElse(d.eqStr.get(m0.keyCol).map(_.map(v => v: Any)))
      val buckets: Option[Set[Int]] = keyVals.flatMap { vs =>
        val hashed = vs.map(bucketOfValue)
        if (hashed.exists(_.isEmpty)) None else Some(hashed.flatten)
      }
      val kept = files.collect {
        case (b, st, zone)
            if buckets.forall(_.contains(b)) && ZonePrune.keep(zone, d) => st
      }
      Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
    }
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
