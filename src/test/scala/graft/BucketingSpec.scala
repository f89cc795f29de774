package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the SCALE.md answer for repeated
  * fact-fact joins on a stable key: bucket both sides once at write
  * time and the join plans with NO exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("bucketed join on a shared key plans without a shuffle exchange") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    val li = Tables.lineitem(s, sf)
    val ord = Tables.orders(s, sf)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val joined = s.table("li_bucketed")
      .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n${plan.take(800)}")
    // same answer as the plain join
    assert(joined.count() == li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
  }
}
