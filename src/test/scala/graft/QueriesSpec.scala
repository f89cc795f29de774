package graft

import org.apache.spark.sql.functions._

/** Smoke + shape checks on every declared query at sf0.001. The real
  * correctness gate is the DuckDB oracle (tools/check_oracle.py,
  * driven by graft.Verify); these tests catch regressions fast. */
class QueriesSpec extends SparkSpec {

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.specs.foreach { q =>
      val df = q.run(spark, sf)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("query names are unique and every oracle key exists") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates reconcile with raw counts") {
    val li = Tables.lineitem(spark, sf)
    val total = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .agg(sum("n_rows")).head.getLong(0)
    val expected = li.filter(col("l_shipdate") <=
      lit("1998-09-01 00:00:00").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q05 full-outer covers every partkey seen in any branch") {
    val out = SparkEntry.queries("q05_evidence_fullouter")(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val keys = li.filter(col("l_returnflag").isin("A", "R") ||
        col("l_linestatus") === "O")
      .select("l_partkey").distinct().count()
    assert(out.count() == keys)
    assert(out.filter(col("ev_qty").isNull || col("ev_cnt").isNull ||
      col("ev_min").isNull).count() == 0)
  }

  test("q19 triadic pairs are canonical (s1 < s2) and distinct") {
    val out = SparkEntry.queries("q19_triadic_closure")(spark, sf)
    assert(out.filter(col("s1") >= col("s2")).count() == 0)
    assert(out.count() == out.distinct().count())
  }
}
