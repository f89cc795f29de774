package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches for the training-data pipeline's "what's in
  * this corpus" tier, next to the HLL++ distinct gate (q140).
  *
  * Count-Min (Cormode & Muthukrishnan 2005): d hash rows × w buckets
  * of additive counters. Build is ONE partial+final aggregation whose
  * output is d·w cells regardless of input size — at 100 TB the
  * shuffle volume is the sketch, not the data (map-side combine
  * collapses each partition to ≤ d·w partial cells first). Point
  * estimates are a broadcast join of the tiny cell table against the
  * query keys: est(k) = min over rows r of cell(r, h_r(k)), an upper
  * bound on the true count (never under-counts; over-counts only via
  * collisions, bounded by ε = e/w with prob 1−δ = 1−e^−d).
  *
  * Hashes use the engine-portable md5 idiom ([[Sampling.md5Bits32]]),
  * so an external oracle replays the SAME sketch bit-for-bit — both
  * the cells and every estimate are hash-exact across engines
  * (unlike the xxhash-seeded hot-path samplers, which need output
  * pinning).
  */
object Sketches {

  /** One portable hash row: h_r(key) = md5-uniform("seed|r|key") mod w. */
  private def bucket(seed: Long, w: Int, row: Column, key: Column): Column =
    Sampling.md5Bits32(seed, row, key) % w

  /** Build the d×w Count-Min cell table `(r, b, cnt)` over `keyCol`,
    * weighting each occurrence by 1. The d-fold row expansion happens
    * scan-side (narrow explode of a literal range), then collapses to
    * d·w cells in one hash aggregate. */
  def countMinCells(df: DataFrame, keyCol: Column, d: Int, w: Int,
      seed: Long): DataFrame =
    df.select(keyCol.as("key"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), bucket(seed, w, col("r"), col("key")).as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for `keys` (a 1-column DataFrame of query
    * keys) from a cell table built with the same (d, w, seed):
    * `(key, n_cm)` with n_cm = min_r cells(r, h_r(key)). The cell
    * table is d·w rows — always broadcast-able. */
  def countMinEstimate(cells: DataFrame, keys: DataFrame, d: Int, w: Int,
      seed: Long): DataFrame = {
    val k = keys.columns.head
    keys.select(col(k).as("key"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("b", bucket(seed, w, col("r"), col("key")))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy("key")
      .agg(min(col("cnt")).as("n_cm"))
  }

  /** The DuckDB replay of [[bucket]] for oracle SQL: identical md5
    * arithmetic, `key` an SQL expression of BIGINT/VARCHAR type. */
  def bucketSqlTwin(seed: Long, w: Int, rowExpr: String, keyExpr: String): String =
    s"('0x' || substr(md5('$seed|' || CAST($rowExpr AS VARCHAR) || '|' || " +
      s"CAST($keyExpr AS VARCHAR)), 1, 8))::BIGINT % $w"
}
