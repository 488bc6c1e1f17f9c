package graft

import org.apache.spark.sql.functions._
import graft.llm.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): (Long, String) =
    (0L, (0 until n).map(i => s"t$i").mkString(" "))

  test("slidingChunks covers every token with the expected overlap") {
    val df = Seq(doc(100)).toDF("doc_id", "text")
    val rows = Chunking.slidingChunks(df, chunkTokens = 64, strideTokens = 48)
      .orderBy("chunk_idx").collect()
    // starts 0, 48, 96 for n=100; the trailing chunks are clipped at the
    // document end (48+64 > 100 → 52 tokens), overlap = chunk - stride = 16
    assert(rows.map(_.getAs[Long]("chunk_start")).toSeq == Seq(0L, 48L, 96L))
    assert(rows.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(64L, 52L, 4L))
  }

  test("a document shorter than one chunk yields a single short chunk") {
    val df = Seq(doc(5)).toDF("doc_id", "text")
    val rows = Chunking.slidingChunks(df, chunkTokens = 64, strideTokens = 48)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_chunk_tokens") == 5L)
    assert(rows.head.getAs[Long]("chunk_start") == 0L)
  }

  test("chunk_hash matches md5 of the space-joined slice") {
    val df = Seq(doc(60)).toDF("doc_id", "text")
    val got = Chunking.slidingChunks(df, chunkTokens = 64, strideTokens = 48)
      .select("chunk_hash").as[String].head()
    val want = df.select(md5(col("text"))).as[String].head()
    // n=60 < chunk=64: the only chunk is the whole document
    assert(got == want)
  }

  test("boundary: n a multiple of stride emits no empty trailing chunk") {
    val df = Seq(doc(48)).toDF("doc_id", "text")
    val rows = Chunking.slidingChunks(df, chunkTokens = 64, strideTokens = 48)
      .collect()
    assert(rows.length == 1)
    // n=49 has a start at 48 (one-token chunk)
    val df2 = Seq(doc(49)).toDF("doc_id", "text")
    val rows2 = Chunking.slidingChunks(df2, chunkTokens = 64, strideTokens = 48)
      .orderBy("chunk_idx").collect()
    assert(rows2.length == 2)
    assert(rows2.last.getAs[Long]("n_chunk_tokens") == 1L)
  }
}
