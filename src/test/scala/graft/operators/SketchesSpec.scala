package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Count-Min sketch invariants (q141's operator). */
class SketchesSpec extends SparkSpec {

  private val (d, w, seed) = (4, 512, 42L)

  private def keyed = Tables.lineitem(spark, sf)
    .select(col("l_partkey").cast("long").as("key"))

  test("every hash row of the cell table holds every increment") {
    val cells = Sketches.countMinCells(keyed, col("key"), d, w, seed)
    val n = keyed.count()
    val perRow = cells.groupBy("r").agg(sum("cnt").as("tot"))
      .collect().map(r => r.getAs[Int]("r") -> r.getAs[Long]("tot")).toMap
    assert(perRow.keySet == (0 until d).toSet)
    assert(perRow.values.forall(_ == n), s"row totals $perRow != $n")
  }

  test("estimates never under-count, and are exact when collision-free") {
    val cells = Sketches.countMinCells(keyed, col("key"), d, w, seed)
    val qk = keyed.distinct().limit(200).cache()
    val est = Sketches.countMinEstimate(cells, qk, d, w, seed)
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("n_exact"))
    val both = est.join(exact, "key")
      .select(col("key"), col("n_cm"), col("n_exact")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Long]("n_cm") >= r.getAs[Long]("n_exact"),
        s"CM under-counted key ${r.get(0)}: $r")
    }
  }

  test("a cramped sketch still upper-bounds (collisions only inflate)") {
    val cells = Sketches.countMinCells(keyed, col("key"), d = 2, w = 8, seed = 7)
    val qk = keyed.distinct().limit(50)
    val est = Sketches.countMinEstimate(cells, qk, d = 2, w = 8, seed = 7)
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("n_exact"))
    val both = est.join(exact, "key").collect()
    assert(both.forall(r => r.getAs[Long]("n_cm") >= r.getAs[Long]("n_exact")))
    // with 8 buckets over thousands of keys, collisions are certain
    assert(both.exists(r => r.getAs[Long]("n_cm") > r.getAs[Long]("n_exact")))
  }

  test("cell table is partition-independent") {
    val a = Sketches.countMinCells(keyed, col("key"), d, w, seed)
    val b = Sketches.countMinCells(keyed.repartition(17), col("key"), d, w, seed)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
