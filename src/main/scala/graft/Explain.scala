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
      // count operators in the tree section only (the formatted detail
      // section repeats every node name)
      val tree = plan.split("\n\n").headOption.getOrElse(plan)
      val shuffles = """[+:]- Exchange""".r.findAllIn(tree).size
      val bcasts = "BroadcastExchange".r.findAllIn(tree).size
      val scans = "Scan parquet".r.findAllIn(tree).size
      println(s"\n########## $name  [shuffles=$shuffles broadcasts=$bcasts scans=$scans]")
      println(plan)
    }
    spark.stop()
  }
}
