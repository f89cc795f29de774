package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB path. AQE's skew-join
  * handles storage-level skew; these handle *algorithmic* skew — a
  * group/join key whose group is too large for one task even after
  * AQE splits (the classic hot-key problem).
  */
object Skew {

  /** Salted two-phase aggregation: partial-aggregate on
    * (key, salt ∈ [0, buckets)) then final-aggregate on key. Use for
    * algebraic aggregates (sum/count/min/max) when one key dominates.
    * The salt is hash-deterministic from the full row via `saltFrom`
    * columns, so results are reproducible.
    *
    * sum example: saltedSum(df, Seq("k"), col("v"), 16) ==
    * df.groupBy("k").agg(sum("v")) but with the hot key spread over
    * 16 partial tasks.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int, saltFrom: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltFrom: _*), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("salted_sum"))
  }

  /** Salted broadcast-replicated join for a skewed fact ⋈ small dim
    * when the dim is too big to broadcast whole but a hot fact key
    * hammers one task in a shuffle join: fact side gets a random salt
    * in [0, n), dim side is replicated n times with every salt value,
    * and the join key becomes (key, salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, saltFrom: Seq[Column]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltFrom: _*), lit(buckets)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
