package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the contract-checking layer
  * an ingest pipeline runs before data is allowed downstream
  * (completeness, uniqueness, bounds, format, referential
  * containment), in the style the reference enforces ad hoc with
  * per-script R assertions.
  *
  * Scale design: every row-local constraint compiles into ONE
  * aggregate pass over the table — adding a constraint adds agg
  * COLUMNS, not scans. Metrics are exact integer (numerator,
  * denominator) pairs, never floats, so the report is
  * engine-replayable bit-for-bit and threshold checks are
  * cross-multiplied. Referential containment is the one constraint
  * that genuinely needs a second input: it runs as a single
  * left-anti count against the reference keys.
  */
object Quality {

  sealed trait Constraint {
    def name: String
  }
  /** fraction of non-null values in `col` must be ≥ num/den. */
  final case class Complete(col: String, minNum: Long = 1, minDen: Long = 1)
    extends Constraint { val name = s"complete($col)" }
  /** `cols` combination must be unique across rows. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** numeric `col` must lie in [lo, hi] on every row. */
  final case class Bounds(col: String, lo: Long, hi: Long) extends Constraint {
    val name = s"bounds($col,$lo,$hi)"
  }
  /** string `col` must match `regex` on at least num/den of rows. */
  final case class Matches(col: String, regex: String, minNum: Long = 1,
      minDen: Long = 1) extends Constraint {
    val name = s"matches($col)"
  }
  /** every value of `col` must appear in `refCol` of `ref`. */
  final case class ContainedIn(col: String, ref: DataFrame, refCol: String)
    extends Constraint { val name = s"contained($col)" }

  /** Run all constraints; returns one row per constraint:
    * (constraint, metric_num, metric_den, passed). metric is
    * constraint-specific (satisfied-rows / total, distinct / total,
    * in-bounds / total, matching / total, contained-keys /
    * distinct-keys); `passed` is the cross-multiplied threshold
    * verdict (full satisfaction unless a min fraction is given). */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = constraints.filter(!_.isInstanceOf[ContainedIn])
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: rowLocal.zipWithIndex.map {
      case (Complete(c, _, _), i) => count(col(c)).as(s"_m$i")
      case (Unique(cols), i) =>
        countDistinct(col(cols.head), cols.tail.map(col): _*).as(s"_m$i")
      case (Bounds(c, lo, hi), i) =>
        sum(when(col(c).isNotNull && col(c) >= lo && col(c) <= hi, 1L)
          .otherwise(0L)).as(s"_m$i")
      case (Matches(c, re, _, _), i) =>
        sum(when(col(c).rlike(re), 1L).otherwise(0L)).as(s"_m$i")
      case (c, _) => throw new IllegalArgumentException(c.name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val local = rowLocal.zipWithIndex.map { case (c, i) =>
      val m = row.getLong(i + 1)
      val (num, den, pass) = c match {
        case Complete(_, mn, md) => (m, n, m * md >= mn * n)
        case Unique(_)           => (m, n, m == n)
        case Bounds(_, _, _)     => (m, n, m == n)
        case Matches(_, _, mn, md) => (m, n, m * md >= mn * n)
      }
      (c.name, num, den, pass)
    }
    val refChecks = constraints.collect { case c @ ContainedIn(colName, ref, refCol) =>
      val keys = df.select(col(colName)).where(col(colName).isNotNull).distinct()
      val total = keys.count()
      val orphans = keys
        .join(ref.select(col(refCol).as(colName)).distinct(), Seq(colName),
          "left_anti")
        .count()
      (c.name, total - orphans, total, orphans == 0L)
    }
    (local ++ refChecks)
      .toDF("constraint", "metric_num", "metric_den", "passed")
  }
}
