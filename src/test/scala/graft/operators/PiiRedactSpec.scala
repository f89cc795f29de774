package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PII scrub must produce byte-identical output in Spark (Java
  * regex) and the DuckDB oracle (RE2) — these expected strings were
  * cross-checked against DuckDB's regexp_replace with the same
  * patterns; the spec pins Spark to that shared behavior. */
class PiiRedactSpec extends SparkSpec {

  test("chunk: every char covered, stride-overlap law, short docs one chunk") {
    import spark.implicits._
    val rows = Seq("a" * 500, "b" * 200, "c" * 201, "d").toDF("text")
      .select(col("text"), explode(TextOps.chunk(col("text"), 200, 150)).as("c"))
      .select(col("text"), col("c.chunk_id"), col("c.chunk"))
      .collect()
    val byDoc = rows.groupBy(_.getString(0))
    assert(byDoc("d").map(_.getString(2)).toSeq == Seq("d"))
    assert(byDoc("b" * 200).map(_.getString(2)).toSeq == Seq("b" * 200))
    val c201 = byDoc("c" * 201).sortBy(_.getLong(1)).map(_.getString(2))
    assert(c201.length == 2 && c201(0) == "c" * 200 && c201(1) == "c" * 51)
    val a500 = byDoc("a" * 500).sortBy(_.getLong(1)).map(_.getString(2))
    assert(a500.length == 3 && a500(0).length == 200 && a500(2) == "a" * 200)
    // coverage: chunks at stride 150 span [0, 150+200) ⊇ full length
    assert(a500.map(_.length).sum >= 500)
  }

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
