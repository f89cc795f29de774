package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard packing for training-data pipelines: assign documents to
  * fixed-token-budget shards so downstream loaders read balanced
  * units.
  *
  * Scale design: the running total is windowed PER PARTITION KEY
  * (source), never globally — a global ordered cumsum funnels 100 TB
  * through one task, while per-source windows parallelize across the
  * corpus's natural file/crawl grouping. Shard ids are (source,
  * local_shard) pairs; a doc starts a new shard when its starting
  * offset crosses the budget boundary (docs may straddle budgets —
  * loaders handle the tail, the assignment stays single-pass and
  * deterministic).
  */
object Sharding {

  /** @param docs     (idCol, keyCol, nTokCol) — token counts precomputed
    * @param budget   tokens per shard within each key
    * @return input columns + cum_tokens (inclusive) + shard (0-based) */
  def packShards(docs: DataFrame, idCol: String, keyCol: String,
      nTokCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum_tokens", sum(col(nTokCol)).over(w))
      .withColumn("shard",
        floor((col("cum_tokens") - col(nTokCol)) / lit(budget)).cast("long"))
  }
}
