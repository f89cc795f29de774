package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** GlobalRank: the distributed rank must equal the one-task window
  * rank exactly (including RANK tie semantics and derived ntile /
  * percent_rank), be independent of input partitioning, and plan ONE
  * materialized range exchange (the count branch reuses the rank
  * branch's shuffle — boundary consistency between the two branches
  * is what makes the offsets correct). */
class GlobalRankSpec extends SparkSpec {

  // duplicated keys on purpose: tie semantics are part of the contract
  private def data = {
    import spark.implicits._
    (1 to 500).map(i => (i % 37, i % 7)).toDF("a", "b")
  }

  test("rank/tieRank/ntile/percent_rank equal the window forms, any partitioning") {
    val order = Seq(col("a"), col("b"))
    for (df <- Seq(data, data.repartition(13))) {
      val got = GlobalRank.withRank(df, order, "rk", "n", tieRankCol = "tr")
        .select(col("a"), col("b"), col("tr"),
          GlobalRank.ntileFromRank("rk", "n", 4).as("q4"),
          GlobalRank.ntileFromRank("rk", "n", 7).as("q7"),
          GlobalRank.percentRankFromRank(col("tr"), col("n")).as("pr"))
      val w = Window.orderBy(col("a"), col("b"))
      val want = df.select(col("a"), col("b"),
        rank().over(w).cast("long").as("tr"),
        ntile(4).over(w).as("q4"), ntile(7).over(w).as("q7"),
        percent_rank().over(w).as("pr"))
      // ties make per-row positional assignment arbitrary → compare
      // the full-row MULTISETS (what the oracle hash compare does)
      def ms(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(ms(got) == ms(want))
    }
  }

  test("positional ranks are a permutation of 1..n; tie groups share the min position") {
    val out = GlobalRank.withRank(data, Seq(col("a"), col("b")),
      "rk", "n", tieRankCol = "tr").collect()
    val n = out.head.getAs[Long]("n")
    assert(n == 500L && out.length == 500)
    assert(out.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 500L))
    // tieRank == min positional rank over rows with equal keys
    val byKey = out.groupBy(r => (r.getInt(0), r.getInt(1)))
    byKey.values.foreach { rows =>
      val minRk = rows.map(_.getAs[Long]("rk")).min
      assert(rows.forall(_.getAs[Long]("tr") == minRk))
    }
  }

  test("plan: ONE materialized range exchange; the count branch reuses it") {
    val gr = GlobalRank.withRank(data, Seq(col("a"), col("b")), "rk", "n")
    gr.collect()
    val p = gr.queryExecution.executedPlan.toString
    val materialized = "\\+- Exchange rangepartitioning".r.findAllIn(p).length
    val reused = "ReusedExchange".r.findAllIn(p).length
    assert(reused >= 1, "count branch did not reuse the rank branch's range shuffle:\n" + p.take(3000))
    // the final adaptive plan materializes the range exchange once;
    // every other appearance must be the reused reference
    val finalPlan = p.substring(0, p.indexOf("== Initial Plan ==") match {
      case -1 => p.length; case i => i })
    val finalRange = "\\+- Exchange rangepartitioning".r.findAllIn(finalPlan).length
    assert(finalRange == 1, s"expected 1 materialized range exchange, got $finalRange:\n" + finalPlan.take(3000))
    assert(materialized >= 1)
  }

  test("ntileFromRank matches SQL NTILE for every (n, k) shape incl. k > n") {
    import spark.implicits._
    for (n <- Seq(1, 3, 10, 11, 25); k <- Seq(1, 2, 4, 5, 7, 30)) {
      val df = (1 to n).toDF("v")
      val got = GlobalRank.withRank(df, Seq(col("v")), "rk", "n")
        .select(col("v"), GlobalRank.ntileFromRank("rk", "n", k).as("t"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val want = df.select(col("v"),
          ntile(k).over(Window.orderBy(col("v"))).as("t"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }
}
