package graft

/** Scratch timer: `runMain graft.GateTimer <sfDir> q1,q2,...` — one
  * warm pass then 2 timed noop-sink runs per named gate (local
  * iteration; the publishable protocol lives in [[Bench]]). */
object GateTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.core.GraftSession.local("graft-gate-timer", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once()
      val ts = Seq(once(), once())
      println(f"GATETIME $n min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
