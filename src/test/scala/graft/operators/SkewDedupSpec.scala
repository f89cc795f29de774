package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewDedupSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum") {
    val li = graft.Tables.lineitem(spark, sf)
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(li, Seq("l_returnflag"),
        col("l_quantity").cast("long"), buckets = 16,
        saltFrom = Seq(col("l_orderkey"), col("l_linenumber")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("saltedJoin equals plain join") {
    val li = graft.Tables.lineitem(spark, sf).select("l_partkey", "l_quantity",
      "l_orderkey", "l_linenumber")
    val part = graft.Tables.part(spark, sf).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, "l_partkey").count()
    val salted = Skew.saltedJoin(li, part, "l_partkey", buckets = 8,
      saltFrom = Seq(col("l_orderkey"), col("l_linenumber"))).count()
    assert(plain == salted)
  }

  test("clusterDuplicates groups near-dups under min-id representative") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("d1", "d2")
    val ids = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val out = Dedup.clusterDuplicates(pairs, ids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L) // transitive chain
    assert(out(7L) == 7L && out(9L) == 7L)
    assert(out(5L) == 5L) // singleton maps to itself
  }

  test("end-to-end dedup: minhash → lsh pairs → clusters") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "entirely different words appear in this one")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
    val pairs = Dedup.lshCandidatePairs(sig, bands = 8, rowsPerBand = 2)
      .filter(col("est_jaccard") >= 0.5)
    val clusters = Dedup.clusterDuplicates(pairs, docs.select("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L)
  }

  test("AQE splits a skewed shuffle join at runtime (the no-salt path)") {
    // manual salting (saltedSum/saltedJoin) is the deliberate fix for
    // KNOWN hot keys; for unanticipated skew the engine's own runtime
    // re-plan must kick in. This pins that posture: a 99%-one-key join
    // replans as SortMergeJoin(skew=true) with the hot partition split
    // across tasks — no code change, no salt. Thresholds are lowered
    // only to make toy-scale partitions eligible; the rule is the
    // same one that fires at the default 256 MB thresholds at scale.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4KB")
    val skewed = s.range(200000).select(
      when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val dim = s.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val j = skewed.join(dim, "k")
    assert(j.collect().length == 198010) // executes THIS queryExecution
    val p = j.queryExecution.executedPlan.toString()
    assert(p.contains("skew=true"),
      "AQE did not split the skewed join:\n" + p.take(2000))
  }
}
