package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for BPE merge-rule training ([[TextOps.bpeTrainMerges]]):
  * hand-derived merges on a closed fixture, the overlapping-chain
  * merge semantic the Scaladoc pins (three-pass padded replace), and
  * partition independence of the learned trajectory. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-derived merges on a closed corpus") {
    // corpus: "low" ×3, "lower" ×1, "lowest" ×2 (as repeated words)
    val docs = Seq(
      "low low lower", "low lowest", "lowest").toDF("text")
    val out = TextOps.bpeTrainMerges(docs, col("text"), k = 3)
      .orderBy("step").collect()
    // pair counts step 1: 'l o'=6, 'o w'=6, 'w e'=3, 'e r'=1,
    // 'e s'=2, 's t'=2 → tie 6/6 → lexicographic: 'l o' wins
    assert(out(0).getString(1) == "l o" && out(0).getLong(3) == 6L)
    // step 2: 'lo w'=6 wins
    assert(out(1).getString(1) == "lo w" && out(1).getLong(3) == 6L)
    // step 3: 'low e'=3 beats 'e s'/'s t'=2
    assert(out(2).getString(1) == "low e" && out(2).getLong(3) == 3L)
  }

  test("overlapping chains merge under the pinned three-pass semantic") {
    // 'aaaa' symbolizes to 'a a a a'; first merge is ('a','a') with
    // count 3 (three adjacencies). The three-pass padded replace
    // yields 'aa aa' (passes 1+2), NOT greedy-left 'aa aa' — same
    // here — and the next round learns 'aa aa'
    val docs = Seq("aaaa aaaa").toDF("text")
    val out = TextOps.bpeTrainMerges(docs, col("text"), k = 2)
      .orderBy("step").collect()
    assert(out(0).getString(1) == "a a" && out(0).getLong(3) == 6L)
    assert(out(1).getString(1) == "aa aa" && out(1).getLong(3) == 2L)
  }

  test("trajectory is partition-independent") {
    val docs = Tables_documents().where(col("doc_id") < 120)
    val a = TextOps.bpeTrainMerges(docs.repartition(1), col("text"), k = 4)
      .collect().map(_.toSeq).toSeq
    val b = TextOps.bpeTrainMerges(docs.repartition(7), col("text"), k = 4)
      .collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.head.toString) == b.sortBy(_.head.toString))
  }

  private def Tables_documents() =
    graft.Tables.documents(spark, sf)
}
