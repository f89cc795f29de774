package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained additive aggregate views — the lakehouse
  * ETL shape where a grouped rollup over an append-mostly fact table
  * is kept current by merging each new batch's PARTIAL aggregates
  * into the materialized view, never recomputing the base. Works for
  * any additive measure (count, sum; avg/rate derive at read time as
  * sum/count), and retractions are just negative measures in the
  * delta. The merge is one co-partitioned full-outer join on the
  * group key — cost ∝ |view| + |delta|, independent of the base
  * table's history. The q252 gate proves merge(base-view, delta) ==
  * a full recompute over base ∪ delta, hash-exact.
  */
object MaterializedAgg {

  /** Merge a delta batch's partial aggregates into an additive agg
    * view of identical schema (keys ++ measures, measures BIGINT).
    * Groups absent from one side contribute zero; a group whose
    * merged measures are all zero is retained (callers compact with
    * a trailing filter if tombstoning is wanted). Keys join with
    * NULL-SAFE equality (`<=>`): groupBy folds all null keys into one
    * group, so the merge must match them too or a null-keyed group
    * would split into two rows and break the merge == full-recompute
    * invariant. */
  def applyDelta(view: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val v = view.select(
      (keys.map(k => col(k).as(s"_view_$k")) ++ measures.map(col)): _*)
    val d = delta.select(
      (keys.map(k => col(k).as(s"_delta_$k")) ++
        measures.map(m => col(m).as(s"_delta_$m"))): _*)
    val cond = keys.map(k => v(s"_view_$k") <=> d(s"_delta_$k")).reduce(_ && _)
    v.join(d, cond, "full_outer")
      .select((keys.map(k =>
        when(col(s"_view_$k").isNotNull, col(s"_view_$k"))
          .otherwise(col(s"_delta_$k")).as(k)) ++
        measures.map(m =>
          (coalesce(col(m), lit(0L)) + coalesce(col(s"_delta_$m"), lit(0L)))
            .as(m))): _*)
  }
}
