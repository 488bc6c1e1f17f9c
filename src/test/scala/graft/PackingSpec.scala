package graft

import org.apache.spark.sql.functions._
import graft.llm.Packing

/** Sequence packing: budget boundaries, per-group independence. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences rolls to a new sequence at the token budget") {
    val df = Seq(
      (0L, "a", 60L), (1L, "a", 50L), (2L, "a", 10L), (3L, "a", 100L),
      (10L, "b", 100L), (11L, "b", 1L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Packing.packSequences(df, budgetTokens = 100L)
      .select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // source a: exclusive cumsums 0, 60, 110, 120 -> seqs 0, 0, 1, 1
    assert(out(0L) == 0L && out(1L) == 0L)
    assert(out(2L) == 1L && out(3L) == 1L)
    // source b packs independently: 0, 100 -> seqs 0, 1
    assert(out(10L) == 0L && out(11L) == 1L)
  }
}
