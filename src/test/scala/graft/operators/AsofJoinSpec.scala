package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: latest right row at-or-before each left row,
  * per key; same-instant right rows visible; no right row → null. */
class AsofJoinSpec extends SparkSpec {

  test("asof join picks latest at-or-before, handles ties and misses") {
    import spark.implicits._
    val clicks = Seq(
      (100L, 1L, 10L), // after purchases at ts 5,8 → sees 8's payload
      (101L, 1L, 8L),  // same instant as purchase 1008 → sees it
      (102L, 1L, 3L),  // before all purchases → null
      (103L, 2L, 50L)  // user with no purchases → null
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1005L, 1L, 5L),
      (1008L, 1L, 8L)
    ).toDF("event_id", "user_id", "ts")
    val out = AsofJoin.asofJoin(clicks, purchases, "user_id", "ts",
        "event_id", "event_id", "prior_purchase_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(
      100L -> Some(1008L), 101L -> Some(1008L), 102L -> None, 103L -> None))
  }

  test("asof join output is exactly |left| and plans one window, no range join") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong, (i % 7).toLong, (i * 3).toLong))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 200).map(i => (10000L + i, (i % 7).toLong, (i * 5).toLong))
      .toDF("event_id", "user_id", "ts")
    val out = AsofJoin.asofJoin(left, right, "user_id", "ts",
      "event_id", "event_id", "p")
    assert(out.count() == 500)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n${plan.take(600)}")
  }
}
