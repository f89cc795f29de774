package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HexSlice32Spec extends SparkSpec {
  import spark.implicits._

  test("value-identical to conv(substr,16,10) on md5 hex at every slice offset") {
    val df = (0 until 500).map(i => s"k$i").toDF("key")
      .select(md5(concat(lit("42|"), col("key"))).as("hex"))
    val cmp = df.select((0 to 3).flatMap { r =>
      Seq(HexSlice32(col("hex"), lit(r * 8)).as(s"n$r"),
        conv(col("hex").substr(lit(r * 8 + 1), lit(8)), 16, 10).cast("long").as(s"c$r"))
    }: _*).collect()
    cmp.foreach { row =>
      for (r <- 0 to 3)
        assert(row.getLong(2 * r) == row.getLong(2 * r + 1))
    }
  }

  test("dynamic start column, null and malformed handling") {
    val dyn = Seq(("00000001ffffffff", 0), ("00000001ffffffff", 1))
      .toDF("hex", "r")
      .select(HexSlice32(col("hex"), col("r") * 8).as("n")).collect()
    assert(dyn(0).getLong(0) == 1L && dyn(1).getLong(0) == 4294967295L)
    val bad = Seq(("xyzzy not hex!!!", 0), ("short", 0))
      .toDF("hex", "r")
      .select(HexSlice32(col("hex"), col("r")).as("n")).collect()
    assert(bad.forall(_.isNullAt(0)))
    val nul = Seq[(Option[String], Int)]((None, 0)).toDF("hex", "r")
      .select(HexSlice32(col("hex"), col("r")).as("n")).collect()
    assert(nul(0).isNullAt(0))
    // uppercase hex parses like conv (case-insensitive)
    val up = Seq(("DEADBEEF00000000", 0)).toDF("hex", "r")
      .select(HexSlice32(col("hex"), col("r")).as("n")).head().getLong(0)
    assert(up == 0xDEADBEEFL)
  }

  test("interpreted eval agrees with codegen") {
    val e = HexSlice32(
      org.apache.spark.sql.catalyst.expressions.Literal("0000002a00000000"),
      org.apache.spark.sql.catalyst.expressions.Literal(0))
    assert(e.eval(null) == 42L)
    assert(HexSlice32.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString("ffffffff"), 0) ==
      4294967295L)
  }
}
