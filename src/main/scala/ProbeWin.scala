object ProbeWin {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder
      .master("local[8]").appName("probe")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        val wins = df.queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty =>
            val aggBelow = w.child.collectFirst { case a: Aggregate => a }.isDefined
            s"aggBelow=$aggBelow"
        }
        val ms = (System.nanoTime() - t0) / 1000000
        if (wins.nonEmpty) println(s"WINAUDIT $n ${wins.mkString(",")} build_ms=$ms")
        else if (ms > 3000) println(s"SLOWBUILD $n build_ms=$ms")
      } catch { case e: Exception => println(s"WINAUDIT_ERR $n ${e.getClass.getSimpleName}") }
    }
    println("WINAUDIT_DONE")
    spark.stop()
  }
}
