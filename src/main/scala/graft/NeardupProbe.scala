package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextAnalysis}

/** One-off stage decomposition of x_neardup_survivors for the scale
  * curve: times candidates / +verify / +CC prefixes at 1x and 10x.
  */
object NeardupProbe {
  private def time(f: => DataFrame): Double = {
    f.write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("neardup-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale_r7/x10")) {
      def state0 = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id").as("id"),
          Dedup.shingles(TextAnalysis.tokens(col("text")), 3).as("arr"))
        .withColumn("sig", Dedup.minhashSignature(col("arr"), 32))
      def rekey(off: Long) = state0.select(
        (col("id") + off).as("id"), col("arr"), col("sig"))
      def state = state0.union(rekey(1000000000L)).union(rekey(2000000000L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def run(stage: String): DataFrame = {
        val st = state
        val cands = Dedup.minhashCandidatesFromSigs(st.select("id", "sig"))
        val out = stage match {
          case "cands" => cands
          case "verify" => Dedup.verifyJaccardFromShingles(cands, st)
            .filter(col("jaccard") >= 1.0)
          case _ =>
            val pairs = Dedup.verifyJaccardFromShingles(cands, st)
              .filter(col("jaccard") >= 1.0)
            val losers = Dedup.duplicateClusters(pairs)
              .filter(col("id") =!= col("cluster_id")).select("id")
            st.select("id").join(losers, Seq("id"), "left_anti")
        }
        out
      }
      for (stage <- Seq("cands", "verify", "full")) {
        val t = time(run(stage))
        spark.catalog.clearCache()
        println(f"NEARDUP $dir $stage%-7s $t%7.3f s")
      }
    }
    spark.stop()
  }
}
