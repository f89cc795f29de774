package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the keyed copy-on-write MERGE ([[MergeTable]], gate
  * q280): end-state equivalence vs the full-shuffle recompute,
  * bucket pruning in the survivors scan, byte-identity of untouched
  * buckets, whole-bucket deletion, batch-conflict rejection, and
  * idempotent re-merge. */
class MergeTableSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-merge").toString + "/t"

  private def base: DataFrame = Tables.orders(spark, sf).select(
    col("o_orderkey").cast("long").as("k"),
    col("o_custkey").cast("long").as("ck"),
    graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))

  private def content(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("k", "ck", "cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("merge end state == full recompute (anti-join + union)") {
    val dir = tmpDir()
    MergeTable.create(base, dir, "k", nBuckets = 8)
    val ups = base.where(col("k") % 11 === 0)
      .withColumn("cents", col("cents") + 5L)
      .unionByName(base.where(col("k") % 13 === 0)
        .withColumn("k", col("k") + 1000000L))
    val del = base.where(col("k") % 17 === 0 && col("k") % 11 =!= 0).select("k")
    MergeTable.merge(spark, dir, ups, del)
    val expected = MergeTable.mergeBrute(base, "k", ups, del)
    assert(content(MergeTable.read(spark, dir)) == content(expected))
  }

  test("untouched buckets are byte-identical; touched buckets only are rewritten") {
    val dir = tmpDir()
    MergeTable.create(base, dir, "k", nBuckets = 8)
    // one single-key batch → exactly one affected bucket
    val oneKey = base.orderBy("k").limit(1)
    val touched = oneKey
      .select(pmod(xxhash64(col("k")), lit(8)).cast("int")).head().getInt(0)
    def fileSig(b: Int): Seq[(String, Long)] = {
      val d = new java.io.File(s"$dir/data/bucket=$b")
      if (!d.exists()) Seq.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).sorted
        .map(f => (f.getName, f.length())).toSeq
    }
    val before = (0 until 8).map(fileSig)
    MergeTable.merge(spark, dir,
      oneKey.withColumn("cents", col("cents") + 1L),
      spark.range(0).select(col("id").as("k")))
    val after = (0 until 8).map(fileSig)
    (0 until 8).foreach { b =>
      if (b == touched) assert(before(b) != after(b), s"bucket $b should be rewritten")
      else assert(before(b) == after(b), s"bucket $b should be untouched")
    }
  }

  test("survivors scan is partition-pruned to the affected buckets") {
    val dir = tmpDir()
    MergeTable.create(base, dir, "k", nBuckets = 8)
    val oneKey = base.orderBy("k").limit(1)
    val touched = oneKey
      .select(pmod(xxhash64(col("k")), lit(8)).cast("int")).head().getInt(0)
    // the pruning MergeTable.merge plans internally, reproduced here
    // so the PartitionFilters entry is assertable on a held plan
    val pruned = spark.read.parquet(s"$dir/data")
      .where(col("bucket").isin(Integer.valueOf(touched)))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"expected partition pruning on bucket:\n${scan.take(600)}")
    assert(pruned.count() ==
      base.where(pmod(xxhash64(col("k")), lit(8)).cast("int") === touched).count())
  }

  test("deleting every key of a bucket drops the bucket directory whole") {
    val dir = tmpDir()
    MergeTable.create(base, dir, "k", nBuckets = 4)
    val victim = 2
    val delKeys = base
      .where(pmod(xxhash64(col("k")), lit(4)).cast("int") === victim).select("k")
    val nDel = delKeys.count()
    assert(nDel > 0)
    MergeTable.merge(spark, dir, base.limit(0), delKeys)
    assert(!new java.io.File(s"$dir/data/bucket=$victim").exists(),
      "fully-deleted bucket directory should be gone")
    assert(MergeTable.read(spark, dir).count() == base.count() - nDel)
  }

  test("conflicting batches are rejected loudly") {
    val dir = tmpDir()
    MergeTable.create(base, dir, "k", nBuckets = 4)
    val k0 = base.orderBy("k").limit(1)
    // duplicate upsert key
    intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, k0.unionByName(k0), base.limit(0).select("k"))
    }
    // key both upserted and deleted
    intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, k0, k0.select("k"))
    }
    // duplicate keys at create
    intercept[IllegalArgumentException] {
      MergeTable.create(base.unionByName(k0), tmpDir(), "k", nBuckets = 4)
    }
  }

  test("re-merging the same upserts is idempotent") {
    val dir = tmpDir()
    MergeTable.create(base, dir, "k", nBuckets = 4)
    val ups = base.where(col("k") % 7 === 0).withColumn("cents", col("cents") + 9L)
    val noDel = base.limit(0).select("k")
    MergeTable.merge(spark, dir, ups, noDel)
    val first = content(MergeTable.read(spark, dir))
    MergeTable.merge(spark, dir, ups, noDel)
    assert(content(MergeTable.read(spark, dir)) == first)
  }
}
