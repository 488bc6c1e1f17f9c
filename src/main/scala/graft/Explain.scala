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
    // opt into the imperative-stage capture (addDelivery et al. skip
    // the per-stage plan rendering unless someone is reading it)
    graft.core.PlanAudit.enabled = true
    names.foreach { name =>
      graft.llm.IncrementalDedup.lastStagePlans = Nil
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val (shuffles, bcasts, scans) = graft.core.PlanAudit.counts(df)
      println(s"\n########## $name  [shuffles=$shuffles broadcasts=$bcasts scans=$scans]")
      // imperative pipelines (addDelivery) surface their internal
      // stages through the side channel — one audit row per stage, so
      // the table shows what actually shuffles, not just the
      // post-admission read
      graft.llm.IncrementalDedup.lastStagePlans.foreach { st =>
        println(s"########## $name/${st.name}  [shuffles=${st.shuffles} " +
          s"broadcasts=${st.broadcasts} scans=${st.scans}]")
      }
      println(plan)
    }
    spark.stop()
  }
}
