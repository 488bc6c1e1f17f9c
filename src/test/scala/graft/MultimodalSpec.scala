package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((0L, "abcdefgh"), (1L, "x")).toDF("doc_id", "text")

  test("payload + metadata plumbing carries binary with typed meta") {
    val df = Multimodal.withSyntheticPayload(docs)
    assert(df.schema("payload").dataType.typeName == "binary")
    val meta = Multimodal.metaOnly(df).filter(col("doc_id") === 0L).head()
    assert(meta.getAs[Long]("n_bytes") == 8L)
    assert(meta.getAs[org.apache.spark.sql.Row]("media_meta")
      .getAs[String]("kind") == "image")
  }

  test("decodeFeatures runs partition-local and is deterministic") {
    implicit val s = spark
    val feats = Multimodal.decodeFeatures(Multimodal.withSyntheticPayload(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[scala.collection.Seq[Double]]("feature").toSeq)).toMap
    assert(feats(0L)._1 == 8L)
    assert(feats(0L)._2.length == 8)
    assert(math.abs(feats(0L)._2.sum - 1.0) < 1e-12) // L1-normalised
    // 'a'..'h' are all in byte bin 3 (97..104 * 8 / 256)
    assert(feats(1L)._2.count(_ > 0) == 1)
  }

  test("decode → feature-cosine dedup finds identical payloads") {
    implicit val s = spark
    import spark.implicits._
    val d = Seq((0L, "tiger tiger burning"), (1L, "tiger tiger burning"),
      (2L, "completely different 123 !!!")).toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(
      Multimodal.withSyntheticPayload(d), bins = 64)
      .select(org.apache.spark.sql.functions.col("doc_id").as("vec_id"),
        org.apache.spark.sql.functions.col("feature").as("embedding"))
    val pairs = graft.llm.Similarity.exactFeatureDupPairs(feats)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("StubCodec resize and frame sampling shapes") {
    val p = "0123456789".getBytes("UTF-8")
    assert(Multimodal.StubCodec.resize(p, 4).length == 4)
    assert(Multimodal.StubCodec.resize(p, 16).length == 16)
    val frames = Multimodal.StubCodec.sampleFrames(p, stride = 4, frameLen = 2)
    assert(frames.map(new String(_, "UTF-8")) == Seq("01", "45", "89"))
  }
}
