package graft

/** Per-query latency profiler: `runMain graft.Profile <sfDir> <n> [query ...]`
  * runs each named query `n` times in one warm JVM and prints
  * min/median/max — min is the plan's floor cost (what a warm cluster
  * pays), median-minus-min is harness noise (GC, page cache). The tool
  * behind "is this 1 s a plan problem or a measurement problem?".
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.GraftSession.local("graft-profile", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // one warm-up materialization (codegen compile, footer cache)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $name%-28s min=${ts.head}%6.3f med=${ts(n / 2)}%6.3f max=${ts.last}%6.3f")
    }
    spark.stop()
  }
}
