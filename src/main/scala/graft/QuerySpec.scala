package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark query plus (when the op is
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same
  * parquet tables. Keeping both sides in one value prevents alias
  * drift — the driver's comparator sorts columns by NAME before
  * hashing, so every computed column must carry the same alias in both.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object QuerySpec {
  def sql(name: String, oracle: String, doc: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle.stripMargin.trim), doc)

  /** Non-SQL-expressible op: driver falls back to rows-only check. */
  def rowsOnly(name: String, doc: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None, doc)
}
