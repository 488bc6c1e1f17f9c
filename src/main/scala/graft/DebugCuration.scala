package graft

import org.apache.spark.sql.functions._
import graft.llm._

/** Temporary stage-timing harness for x_curation_pipeline (deleted after
  * profiling).
  */
object DebugCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-debug", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"== round $round")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val cfg = CurationPipeline.Config(minQuality = 0.1)
      val scored = TextAnalysis.textStats(docs, "text")
        .withColumn("quality",
          TextAnalysis.qualityScore(col("n_tokens"), col("stopword_ratio")))
        .withColumn("predicted_lang", TextAnalysis.langId(col("text")))
        .drop("char_count", "avg_token_len", "stopword_ratio")
      val gated = scored.filter(col("quality") >= cfg.minQuality)
      val exact = Dedup.dropExactDuplicates(gated, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("materialize exact")(exact.write.format("noop").mode("overwrite").save())
      val cands = time("minhashCandidates+filter")({
        val c = Dedup.minhashCandidates(exact)
          .filter(col("est_jaccard") >= cfg.nearDupJaccard / 2)
        c.write.format("noop").mode("overwrite").save(); c
      })
      val pairs = time("verifyJaccard")({
        val p = Dedup.verifyJaccard(cands, exact)
          .filter(col("jaccard") >= cfg.nearDupJaccard)
        p.write.format("noop").mode("overwrite").save(); p
      })
      val clusters = time("duplicateClusters")(Dedup.duplicateClusters(pairs))
      val losers = clusters.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      time("final anti-join+split")(
        Sampling.hashSplit(deduped, "doc_id")
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
