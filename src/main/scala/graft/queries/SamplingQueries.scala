package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Stochastic operators in the gate — deterministic (seeded, hash
  * keyed) but not oracle-expressible in DuckDB (different hash
  * function), so rows-only.
  */
object SamplingQueries {

  /** R1 — rarefaction to equal depth per group. */
  val q63 = QuerySpec.rowsOnly(
    "q63_rarefaction",
    "seeded multivariate-hypergeometric rarefaction (SURVEY R1)") { (s, d) =>
    val ab = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("group"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("long")).as("count"))
    Sampling.rarefy(ab, depth = 1000, seed = 42)
  }

  /** R2/R5 — hash-deterministic stratified sampling. */
  val q64 = QuerySpec.rowsOnly(
    "q64_stratified_sample",
    "deterministic stratified fraction sample (SURVEY R2,R5)") { (s, d) =>
    Sampling.stratifiedSample(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"), fraction = 0.1, seed = 42)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_sampled"))
  }

  /** R6 — seeded random fragment of a "sequence" column. */
  val q65 = QuerySpec.rowsOnly(
    "q65_random_fragment",
    "seeded random substring fragments (SURVEY R6)") { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      Sampling.randomFragment(col("text"), col("doc_id"), 0.5, 42).as("fragment"))
  }

  val all: Seq[QuerySpec] = Seq(q63, q64, q65)
}
