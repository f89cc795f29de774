package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the payload of the LATEST right
  * row with `ts_right <= ts_left` on the same key (point-in-time
  * correctness: feature attribution, last-known-state lookup,
  * slowly-changing-dimension reads). Beyond the reference's surface;
  * first-class for training-data pipelines.
  *
  * NOT implemented as a range join: a range join explodes with
  * history depth (every left row × every earlier right row before
  * aggregation). Instead both sides union into one stream and a
  * single window pass carries the last non-null payload forward —
  * one shuffle on the key, one per-partition sort, output exactly
  * |left|. That is the shape that survives 100 TB event logs with
  * arbitrarily deep per-key histories; skew concentrates in hot keys
  * exactly like any window, and AQE/salting apply unchanged.
  *
  * Ordering is the deterministic total order (ts, side, ord): right
  * rows sort before left rows at equal ts (a state change at t is
  * visible to a read at t), and `ord` breaks right-right ties — so
  * results are engine-portable and an external oracle can replay
  * them (window `last_value IGNORE NULLS` is ANSI).
  */
object AsofJoin {

  /** @param key     equi-join key column (both sides)
    * @param ts      event-time column (both sides)
    * @param ord     deterministic tie-break column (both sides)
    * @param payload right-side column to carry; left rows gain
    *                `outCol` = latest visible payload (null if none)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      ord: String, payload: String, outCol: String): DataFrame = {
    val payloadType = right.schema(payload).dataType
    val l = left
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__isL", lit(1))
    val rBase = right.select(col(key), col(ts), col(ord), col(payload).as("__p"))
    val extras = l.columns.filterNot(Set(key, ts, ord, "__p", "__isL"))
    val r = extras.foldLeft(rBase) { (d, c) =>
      d.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.withColumn("__isL", lit(0)).select(l.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__isL"), col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol, last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__isL") === 1)
      .drop("__p", "__isL")
  }
}
