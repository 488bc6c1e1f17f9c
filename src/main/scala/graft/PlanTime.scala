package graft

/** Scratch diagnostics: `runMain graft.PlanTime <sfDir> <gate>` — split a
  * gate's wall time into DataFrame construction, analysis, optimization,
  * physical planning, and execution (the noop save), to separate driver
  * planning cost from cluster work.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.core.GraftSession.local("graft-plan-time", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
      var t = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = ms(t)
      val qe = df.queryExecution
      t = System.nanoTime(); qe.analyzed; val tAna = ms(t)
      t = System.nanoTime(); qe.optimizedPlan; val tOpt = ms(t)
      t = System.nanoTime(); qe.executedPlan; val tPhys = ms(t)
      t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = ms(t)
      spark.catalog.clearCache()
      println(f"PLANTIME $name%-28s build=$tBuild%.0f analyze=$tAna%.0f " +
        f"optimize=$tOpt%.0f physical=$tPhys%.0f execute=$tExec%.0f ms")
    }
    spark.stop()
  }
}
