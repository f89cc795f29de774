package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaterializedAggSpec extends SparkSpec {

  private def rollup(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("user_id")
    .agg(count(lit(1)).as("n_events"),
      sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))

  private def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("applyDelta: merge == recompute, disjoint keys append, retraction inverts") {
    val ev = graft.Tables.events(spark, sf).cache()
    val base = ev.where(pmod(col("event_id"), lit(3)) =!= 0)
    val delta = ev.where(pmod(col("event_id"), lit(3)) === 0)
    val merged = MaterializedAgg.applyDelta(rollup(base), rollup(delta),
      Seq("user_id"), Seq("n_events", "sum_cents"))
    assert(toMap(merged) == toMap(rollup(ev)), "merge != full recompute")

    // a delta whose keys are absent from the view must append as-is
    val onlyNew = MaterializedAgg.applyDelta(
      rollup(base).where(lit(false)), rollup(delta),
      Seq("user_id"), Seq("n_events", "sum_cents"))
    assert(toMap(onlyNew) == toMap(rollup(delta)))

    // retraction: applying the delta's negation restores the view for
    // every key the delta touched (untouched keys unchanged)
    val neg = rollup(delta).select(col("user_id"),
      (-col("n_events")).as("n_events"), (-col("sum_cents")).as("sum_cents"))
    val restored = MaterializedAgg.applyDelta(merged, neg,
      Seq("user_id"), Seq("n_events", "sum_cents"))
    val baseMap = toMap(rollup(base))
    toMap(restored).foreach { case (k, v) =>
      assert(v == baseMap.getOrElse(k, (0L, 0L)),
        s"retraction did not invert for key $k")
    }
  }

  test("applyDelta: null keys merge into ONE group, like groupBy") {
    import spark.implicits._
    // groupBy folds nulls into one group; the merge join must match
    // them null-safely or the null group splits into two rows
    val base = Seq((Some("a"), 1.0), (None, 2.0), (None, 3.0))
      .toDF("seg", "value").withColumn("user_id", lit(1L))
    val delta = Seq((Some("a"), 4.0), (None, 5.0), (Some("b"), 6.0))
      .toDF("seg", "value").withColumn("user_id", lit(1L))
    def roll(df: org.apache.spark.sql.DataFrame) = df.groupBy("seg")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
    val merged = MaterializedAgg.applyDelta(roll(base), roll(delta),
      Seq("seg"), Seq("n_events", "sum_cents"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    val got = asMap(merged)
    assert(merged.count() == got.size, "null group emitted twice")
    assert(got == asMap(roll(base.unionByName(delta))))
    assert(got(None) == (3L, 1000L))
  }
}
