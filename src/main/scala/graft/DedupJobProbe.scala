package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Scratch probe: job count + wall clock per addDelivery stage, to see
  * where the fixed per-admission overhead lives. */
object DedupJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-dedup-probe", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    val names = scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = Option(js.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        names += s"$site [stages=${js.stageIds.size}]"
      }
    })
    val d = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val split = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val low = d.filter(col("doc_id") <= split)
    val high = d.filter(col("doc_id") > split)
    val root = "/tmp/graft_dedup_probe"
    Seq(root, root + "_warm").foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    // warm
    graft.llm.IncrementalDedup.addDelivery(low.limit(10), root + "_warm",
      minJaccard = 1.0).count()
    jobs = 0; names.clear()
    var t0 = System.nanoTime()
    graft.llm.IncrementalDedup.addDelivery(low, root, minJaccard = 1.0)
    println(f"DELIV1 jobs=$jobs t=${(System.nanoTime()-t0)/1e9}%.2f")
    jobs = 0; names.clear()
    t0 = System.nanoTime()
    graft.llm.IncrementalDedup.addDelivery(high, root, minJaccard = 1.0)
    println(f"DELIV2 jobs=$jobs t=${(System.nanoTime()-t0)/1e9}%.2f")
    names.groupBy(identity).toSeq.sortBy(-_._2.size).foreach { case (n, xs) =>
      println(s"  JOB x${xs.size}: ${n.take(110)}")
    }
    jobs = 0
    t0 = System.nanoTime()
    graft.llm.IncrementalDedup.indexIds(spark, root).write
      .format("noop").mode("overwrite").save()
    println(f"READBACK jobs=$jobs t=${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
