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
    * a trailing filter if tombstoning is wanted). */
  def applyDelta(view: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val d = delta.select(
      (keys.map(col) ++ measures.map(m => col(m).as(s"_delta_$m"))): _*)
    view.join(d, keys, "full_outer")
      .select((keys.map(col) ++ measures.map(m =>
        (coalesce(col(m), lit(0L)) + coalesce(col(s"_delta_$m"), lit(0L)))
          .as(m))): _*)
  }
}
