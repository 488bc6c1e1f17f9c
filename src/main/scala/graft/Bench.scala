package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-footer paths so the first timed query
    // isn't charged ~5s of one-time session cost
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      // touch every table once: footer parse + page-cache warm so query
      // timings measure execution, not first-touch file I/O
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { tbl =>
        try spark.read.parquet(s"$sfDir/$tbl.parquet").limit(10).count()
        catch { case _: Throwable => }
      }
      // steady-state measurement: run every query once at the smallest
      // SF so JIT/codegen/broadcast machinery is warm before timing.
      // The timed run below still executes the full plans on sfDir —
      // this only removes one-time JVM compilation from the numbers,
      // which a long-lived 1000-executor cluster never pays per query.
      val warmDir =
        if (new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
          "/root/testdata/sf0.001" else sfDir
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
      // free every cache entry the warm-up populated (persist() calls in
      // the dedup/similarity operators are plan-keyed): timed queries
      // must neither reuse warm-up caches nor fight them for storage
      spark.catalog.clearCache()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink evaluates every output column; count() would let
      // Catalyst prune the projections being measured
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      // failures carry a negative duration so they can't pass for a
      // normal-looking fast timing in the bench JSON
      val dt = (System.nanoTime() - t0) / 1e9
      (name, if (ok) dt else -dt)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // |dt| so a crashing query can never LOWER the reported total — a
    // broken heavy query must not read as a bench improvement
    val total = results.map { case (_, v) => math.abs(v) }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // stop Spark BEFORE printing so shutdown log lines can't land after
    // the JSON line the driver parses
    spark.sparkContext.setLogLevel("ERROR")
    try spark.stop() catch { case _: Throwable => }
    println(line)
  }
}
