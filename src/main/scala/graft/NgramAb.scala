package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.roundDet
import graft.llm.{Dedup, TextAnalysis}

/** Scratch A/B harness for the ngramJaccardPairs plan variants —
  * interleaved timed runs in ONE window so host heat divides out.
  * `runMain graft.NgramAb <sfDir> <rounds>`.
  */
object NgramAb {
  def variant(df: DataFrame, kind: String, minJaccard: Double): DataFrame = {
    val base = df.select(col("doc_id").as("id"),
      Dedup.shingles(TextAnalysis.tokens(col("text")), 3).as("arr"))
    kind match {
      case "old" => // r17: ids-only join, sizes via exploded count + joins
        val sh0 = base.select(col("id"), explode(col("arr")).as("shs"))
          .select(col("id"), xxhash64(col("shs")).as("sh"))
        val sizes = sh0.groupBy("id").agg(count(lit(1)).as("n_sh"))
        val a = sh0.select(col("sh"), col("id").as("id_a"))
        val b = sh0.select(col("sh"), col("id").as("id_b"))
        a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
          .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
          .withColumn("jaccard", roundDet(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 4))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "jaccard")
      case "carry4" => // carry n below generate, 4-key agg (current)
        val sh0 = base
          .select(col("id"), size(col("arr")).as("n_sh"), col("arr"))
          .select(col("id"), col("n_sh"), explode(col("arr")).as("shs"))
          .select(col("id"), col("n_sh"), xxhash64(col("shs")).as("sh"))
        val a = sh0.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"))
        val b = sh0.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"))
        a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("n_shared"))
          .withColumn("jaccard", roundDet(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 4))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "jaccard")
      case "carry2" => // carry n below generate, 2-key agg + first()
        val sh0 = base
          .select(col("id"), size(col("arr")).as("n_sh"), col("arr"))
          .select(col("id"), col("n_sh"), explode(col("arr")).as("shs"))
          .select(col("id"), col("n_sh"), xxhash64(col("shs")).as("sh"))
        val a = sh0.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"))
        val b = sh0.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"))
        a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("n_shared"),
            first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
          .withColumn("jaccard", roundDet(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 4))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "jaccard")
      case "mapsizes" => // ids-only join/agg, sizes via map-only scan + joins
        val sh0 = base.select(col("id"), explode(col("arr")).as("shs"))
          .select(col("id"), xxhash64(col("shs")).as("sh"))
        val sizes = base.select(col("id"), size(col("arr")).as("n_sh"))
        val a = sh0.select(col("sh"), col("id").as("id_a"))
        val b = sh0.select(col("sh"), col("id").as("id_b"))
        a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
          .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
          .withColumn("jaccard", roundDet(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 4))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "jaccard")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.core.GraftSession.local("graft-ngram-ab", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val kinds = Seq("old", "carry4", "carry2", "mapsizes")
    // result-equality sanity before timing
    val ref = variant(docs, "old", 0.2).collect().map(_.toString).sorted
    kinds.tail.foreach { k =>
      val got = variant(docs, k, 0.2).collect().map(_.toString).sorted
      require(got.sameElements(ref), s"variant $k diverges from old")
    }
    // warmup each
    kinds.foreach(k => variant(docs, k, 0.2)
      .write.format("noop").mode("overwrite").save())
    val times = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    (1 to rounds).foreach { _ =>
      kinds.foreach { k =>
        val t0 = System.nanoTime()
        variant(docs, k, 0.2).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty) += dt
        spark.catalog.clearCache()
      }
    }
    kinds.foreach { k =>
      val ts = times(k).sorted
      println(f"NGRAMAB $k%-9s min=${ts.head}%.3f med=${ts(ts.length / 2)}%.3f " +
        s"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
