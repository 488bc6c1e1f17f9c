package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Scratch diagnostics: `runMain graft.JobProbe <sfDir> <gate>` — runs
  * one gate invocation with a job listener and prints every Spark job's
  * wall time and first stage name, to locate fixed-overhead hotspots.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.core.GraftSession.local("graft-job-probe", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (s, desc) =>
          rows += ((j.jobId, s, System.nanoTime(), desc)) }
    })
    val fn = SparkEntry.queries(name)
    // warm pass
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    rows.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"JOBPROBE $name total=$total%.3f jobs=${rows.size}")
    // start/end offsets from t0 expose DRIVER-SIDE gaps between jobs
    rows.sortBy(_._1).foreach { case (id, s, e, desc) =>
      println(f"  job $id%3d [${(s - t0) / 1e9}%7.3f -> ${(e - t0) / 1e9}%7.3f] ${(e - s) / 1e9}%6.3f  $desc")
    }
    println(f"  sum-of-jobs=${rows.map(r => (r._3 - r._2) / 1e9).sum}%.3f")
    spark.stop()
  }
}
