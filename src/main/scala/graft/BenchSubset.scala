package graft

import org.apache.spark.sql.SparkSession

/** Developer micro-bench: time a subset of gate queries WARM (after
  * the same warmCaches pass the official Bench pays in its warm-up),
  * so per-query numbers are attributable exactly like the official
  * record. Selection via SPARK_GRAFT_ONLY (prefix match, like Verify);
  * unset = all queries. One line per query + a total, to stdout. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.cleaner.periodicGC.interval", "30s") // see Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w0 = System.nanoTime()
    SparkEntry.warmCaches(spark, sfDir)
    println(f"[subset] warmup ${(System.nanoTime() - w0) / 1e9}%.2f s")
    var total = 0.0
    SparkEntry.specs
      .filter(q => only.forall(_.exists(q.name.startsWith)))
      .foreach { q =>
        val t0 = System.nanoTime()
        val n = try q.run(spark, sfDir).count() catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"[subset] ${q.name}%-34s $sec%8.2f s  rows=$n")
      }
    println(f"[subset] total $total%.2f s")
    spark.stop()
  }
}
