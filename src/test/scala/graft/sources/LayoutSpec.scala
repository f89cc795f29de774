package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Write-side clustering: q139 oracles the z-order KEY; this spec
  * pins what the key is FOR — files written by
  * [[Tabular.writeClusteredParquet]] cover disjoint z-ranges, the
  * precondition for min-max file/row-group skipping on every
  * clustered dimension. */
class LayoutSpec extends SparkSpec {

  test("clustered writer produces disjoint per-file z-ranges, same rows") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/li"
    Tabular.writeClusteredParquet(li, out, Seq("l_partkey", "l_suppkey"),
      nFiles = 4, maxRecordsPerFile = 1000)
    val back = spark.read.parquet(out)
    // fidelity: the layout is a permutation, not a transformation
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // disjointness: order files by their min z-key; each file's max
    // must not pass the next file's min (ties on the boundary allowed)
    val zkey = graft.functions.ZOrderKey(21,
      col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
    val ranges = back.select(input_file_name().as("f"), zkey.as("z"))
      .groupBy("f").agg(min("z").as("zmin"), max("z").as("zmax"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 4, s"maxRecordsPerFile split expected >4 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file z-ranges overlap: max $aMax > next min $bMin")
      case _ =>
    }
  }
}
