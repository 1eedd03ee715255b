package graft

/** Dev helper: time named SparkEntry queries (min of N runs) on a
  * given SF dir — the same measurement Bench takes, isolated per query.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = Tables.session("graft-timeq",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = (1 to 3).map(_ => once()).min
      println(f"TIMEQ $n%-20s $t%.3f s")
    }
    spark.stop()
  }
}
