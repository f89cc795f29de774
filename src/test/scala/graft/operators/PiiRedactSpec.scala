package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PII scrub must produce byte-identical output in Spark (Java
  * regex) and the DuckDB oracle (RE2) — these expected strings were
  * cross-checked against DuckDB's regexp_replace with the same
  * patterns; the spec pins Spark to that shared behavior. */
class PiiRedactSpec extends SparkSpec {

  test("redactPii masks emails and long digit runs, engine-portably") {
    import spark.implicits._
    val cases = Seq(
      "mail a.b+c@x-y.co.uk now"          -> "mail <EMAIL> now",
      "call +1 (555) 123-4567 or 123"     -> "call +<NUMBER> or 123",
      "ssn 123-45-6789 acct 12345678901"  -> "ssn <NUMBER> acct <NUMBER>",
      "clean text, no pii 42"             -> "clean text, no pii 42")
    val out = cases.map(_._1).toDF("text")
      .select(TextOps.redactPii(col("text")).as("clean"))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }
}
