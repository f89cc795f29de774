package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderKeySpec extends SparkSpec {
  import spark.implicits._

  private def refZ(bits: Int, dims: Long*): Long = {
    val k = dims.length
    var key = 0L
    for (d <- 0 until k; b <- 0 until bits)
      key |= ((dims(d) >>> b) & 1L) << (b * k + d)
    key
  }

  test("interleaves bits: known values, dim recovery, clamping") {
    // x=0b101, y=0b011 at 3 bits -> z = y2x2 y1x1 y0x0 = 0b011011
    assert(refZ(3, 5L, 3L) == 27L)
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrderKey(3, col("x"), col("y")).as("z"))
    assert(df.head().getLong(0) == 27L)
    // clamps to low bits: 2^21+7 behaves as 7
    val big = Seq(((1L << 21) + 7L, 1L)).toDF("x", "y")
      .select(ZOrderKey(21, col("x"), col("y")).as("z")).head().getLong(0)
    assert(big == refZ(21, 7L, 1L))
  }

  test("native expression matches the Scala reference over random rows") {
    val rows = (0 until 500).map { i =>
      (i.toLong * 2654435761L % (1L << 21), i.toLong * 40503L % (1L << 21))
    }
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrderKey(21, col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == refZ(21, r.getLong(0), r.getLong(1)))
    }
  }

  test("null dimension nulls the key; codegen path active") {
    val df = Seq((Some(1L), None: Option[Long]), (Some(1L), Some(2L)))
      .toDF("x", "y")
    val out = df.select(ZOrderKey(8, col("x"), col("y")).as("z")).collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
    // a parquet-backed plan (local relations constant-fold before
    // reaching codegen): the `*(n)` prefix marks WholeStageCodegen
    val plan = graft.Tables.lineitem(spark, sf)
      .select(ZOrderKey(21, col("l_partkey").cast("long"),
        col("l_suppkey").cast("long")).as("z"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), "zorder_key fell out of WholeStageCodegen:\n" + plan)
  }

  test("locality: sorting by z-key keeps both dimensions range-bounded per run") {
    // 32x32 grid; after z-sort, any 64-row window spans at most a
    // bounded sub-rectangle (Morton property: 64 keys = few quads)
    val pts = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val sorted = pts.sortBy { case (x, y) => refZ(5, x, y) }
    sorted.grouped(64).foreach { w =>
      val (xs, ys) = (w.map(_._1), w.map(_._2))
      assert(xs.max - xs.min <= 16 && ys.max - ys.min <= 16,
        s"64-key z-run spans ${xs.max - xs.min} x ${ys.max - ys.min}")
    }
  }
}
