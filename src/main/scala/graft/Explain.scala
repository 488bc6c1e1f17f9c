package graft

/** Plan inspection: `runMain graft.Explain <sfDir> [query ...]` prints the
  * formatted physical plan per query (all queries when none named) plus a
  * one-line shuffle/broadcast/scan summary — the feedback loop for the
  * "would this plan survive 100×?" review.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.GraftSession.local("graft-explain", cores = 8)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning"
        .r.findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size
      val scans = "Scan parquet".r.findAllIn(plan).size
      println(s"\n########## $name  [shuffles=$shuffles broadcasts=$bcasts scans=$scans]")
      println(plan)
    }
    spark.stop()
  }
}
