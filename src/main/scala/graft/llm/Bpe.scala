package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * tokenizer-training half of a training-data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units";
  * the reference pipeline has no tokenizer, this is north-star surface).
  *
  * Scale shape: the corpus is touched ONCE (word-frequency count, one
  * shuffle); every subsequent merge iteration runs on the DISTINCT-WORD
  * table, whose size is the corpus vocabulary — bounded by language, not
  * corpus bytes, so 100 TB of text trains at the same per-iteration cost
  * as 100 GB once the word table is built. Driver state per iteration is
  * exactly one row (the argmax pair), k rows total for k merges — the
  * merge table IS the model, and it is config-sized (30k-100k entries in
  * practice), like the IVF quantizer.
  *
  * Determinism: the argmax pair tie-breaks on (count DESC, left ASC,
  * right ASC), so training is reproducible run-to-run and cluster-size
  * independent.
  */
object Bpe {

  /** Whitespace word frequencies — the one corpus-wide pass. */
  def wordFreqs(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character symbols of a word (Spark `split` on the empty pattern).
    * NB: splits on Java chars; supplementary-plane code points (outside
    * the BMP) become surrogate halves. Training on raw unicode text
    * should pre-filter or pre-normalize; the gate trains on an
    * ASCII-word slice where Spark and every oracle agree byte-for-byte.
    */
  def charSymbols(word: Column): Column = split(word, "")

  /** Adjacent-symbol pair counts, weighted by word frequency. `words`
    * must carry (`symsCol`: array<string>, freq: long). Partial
    * aggregation runs map-side, so the exchange carries one row per
    * distinct pair per task — the classic BPE statistics step as a
    * two-column hash aggregate.
    */
  def pairCounts(words: DataFrame, symsCol: String = "syms"): DataFrame = {
    val n = size(col(symsCol))
    words
      .filter(n >= 2)
      .select(col("freq"), explode(
        zip_with(
          slice(col(symsCol), lit(1), n - 1),
          slice(col(symsCol), lit(2), n - 1),
          (a, b) => struct(a.as("left"), b.as("right")))).as("pair"))
      .groupBy(col("pair.left").as("left"), col("pair.right").as("right"))
      .agg(sum(col("freq")).as("n"))
  }

  /** Merge every non-overlapping left-to-right occurrence of the
    * adjacent pair (a, b) in a symbol array into the single symbol a+b —
    * the BPE merge rule as a fold with one symbol of carry, fully inside
    * Catalyst (`aggregate` higher-order function, no UDF):
    * pending=null → stash s; (pending,s)==(a,b) → emit a+b, clear;
    * otherwise emit pending, stash s. The carry makes the scan
    * sequential-with-lookahead-1, which is exactly non-overlapping
    * left-to-right ("aaa" + merge(a,a) → ["aa","a"], as in reference
    * BPE implementations).
    */
  def mergePair(syms: Column, a: String, b: String): Column = {
    val empty = lit(Array.empty[String])
    aggregate(
      syms,
      struct(empty.as("out"), lit(null).cast("string").as("pend")),
      (st, s) => {
        val out = st.getField("out")
        val p = st.getField("pend")
        when(p.isNull, struct(out.as("out"), s.as("pend")))
          .when(p === lit(a) && s === lit(b),
            struct(concat(out, array(lit(a + b))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(p)).as("out"), s.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"), array(st.getField("pend")))))
  }

  /** Apply a learned merge list in rank order to a symbol array —
    * tokenizer application as a folded Catalyst expression. Plan depth
    * grows linearly with merges; fine for spec/gate-sized merge tables
    * (≲ a few hundred). The production-scale encoder is
    * [[encodeWordTable]], whose plan is ONE mapPartitions regardless of
    * merge count; `BpeSpec` pins the two paths equal on trained tables.
    */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => mergePair(c, a, b) }

  /** One learned merge. */
  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Partition-local BPE encode of one symbol array against a rank
    * table — the production tokenizer-application algorithm (the
    * GPT-2/SentencePiece shape): repeatedly find the lowest-rank
    * adjacent pair present and merge all its non-overlapping occurrences
    * left-to-right. O(len²) worst case in the WORD length, independent
    * of merge-table size — which is why a 50k-merge production vocab
    * encodes at the same per-word cost as a 100-merge toy table, where
    * the [[applyMerges]] expression fold pays per table entry.
    *
    * Equivalent to applying the merge list in rank order (what
    * [[applyMerges]] and the DuckDB oracle replay do) whenever the table
    * is well-formed: every compound symbol's components are created by
    * LOWER-ranked merges. Tables from [[train]] satisfy this by
    * construction (a pair can only be counted once its components
    * exist), as do single-character pair tables trivially; `BpeSpec`
    * property-tests the equivalence on trained tables.
    */
  def encodeSymbols(syms0: Array[String],
      ranks: Map[(String, String), Int]): Array[String] = {
    var cur = syms0
    var continue = cur.length >= 2
    while (continue) {
      // lowest-rank adjacent pair present
      var bestRank = Int.MaxValue
      var i = 0
      while (i < cur.length - 1) {
        val r = ranks.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        // merge its occurrences, left-to-right non-overlapping
        val out = new scala.collection.mutable.ArrayBuffer[String](cur.length)
        var j = 0
        while (j < cur.length) {
          if (j < cur.length - 1 &&
            ranks.getOrElse((cur(j), cur(j + 1)), Int.MaxValue) == bestRank) {
            out += cur(j) + cur(j + 1)
            j += 2
          } else { out += cur(j); j += 1 }
        }
        cur = out.toArray
        continue = cur.length >= 2
      }
    }
    cur
  }

  /** Production encoder over a word table: one mapPartitions with the
    * rank table as broadcast state — plan depth constant in merge count
    * (a trained vocab is model state, like the IVF quantizer, NOT plan
    * structure). At 100 TB the corpus is word-frequency-counted once
    * (one shuffle), this encoder runs over the DISTINCT-WORD table
    * (vocabulary-bounded, not corpus-bounded), and token streams are
    * recovered by joining words back — the same touch-the-corpus-once
    * shape as [[train]].
    */
  def encodeWordTable(words: DataFrame, merges: Seq[Merge],
      wordCol: String = "word"): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    words.select(col(wordCol).cast("string")).as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map { w =>
          val syms = if (w.isEmpty) Array.empty[String] else w.split("")
          (w, encodeSymbols(syms, r).toSeq)
        }
      }.toDF(wordCol, "tokens")
  }

  /** Corpus tokenization — the actual pretraining artifact: every
    * document becomes its BPE token stream. Composes [[encodeWordTable]]
    * with the join-back its contract promises: positioned words are
    * exploded once (corpus-bounded map), the DISTINCT-word vocabulary is
    * encoded by the production partition-local encoder
    * (vocabulary-bounded — at 100 TB the vocab is language-sized, not
    * corpus-sized, so the O(len²)-per-word encode cost is paid once per
    * distinct word no matter how often it occurs), and token arrays join
    * back to positions for an ordered per-document flatten.
    *
    * Plan shape: ONE distinct shuffle (vocab), ONE join of positioned
    * words against the encoded vocab (broadcastable when the vocab
    * fits), ONE per-doc aggregation — constant in merge-table size
    * (contrast [[applyMerges]], whose expression fold grows the plan per
    * merge).
    *
    * Output: (idCol, tokens array<string>, n_tokens).
    */
  def encodeCorpus(df: DataFrame, merges: Seq[Merge],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val positioned = df
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val encoded = encodeWordTable(positioned.select("word").distinct(), merges)
    positioned.join(encoded, Seq("word"))
      .groupBy(col("id").as(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("tokens")))),
        s => s.getField("tokens"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Ranked merge table from ONE pair-count pass (no iterative
    * retraining): all adjacent-symbol pairs ranked by (n DESC, left,
    * right). For single-character symbol tables this is a well-formed
    * merge table (components are initial symbols), so the production
    * encoder and a rank-order replay agree — the construction the
    * x_bpe_encode oracle gate uses, since the whole table is
    * recomputable in SQL. Driver state is bounded by the pair
    * vocabulary (≤ charset² for char symbols) — config-sized model
    * state, not data.
    */
  def rankedPairMerges(words: DataFrame, symsCol: String = "syms"): Seq[Merge] =
    pairCounts(words, symsCol)
      .orderBy(col("n").desc, col("left").asc, col("right").asc)
      .collect().zipWithIndex.map { case (r, i) =>
        Merge(i, r.getAs[String]("left"), r.getAs[String]("right"),
          r.getAs[Long]("n"))
      }.toSeq

  /** Pad a merge table to `size` entries with provably-inert merges:
    * every pad symbol contains '#', a character that can never occur in
    * any real symbol (symbols are concatenations of word characters),
    * so pads match nothing, ever. Lets gates/specs exercise the
    * production encoder at production table sizes (≥1k entries) while
    * staying bit-equal to the real-merges-only oracle replay.
    */
  def padMerges(base: Seq[Merge], size: Int): Seq[Merge] =
    base ++ (base.length until size).map(i => Merge(i, s"#$i", s"#$i", 0L))

  /** Free the block-manager state behind a localCheckpoint'ed Dataset.
    * `Dataset.unpersist()` only drops CacheManager entries; the
    * checkpoint's RDD blocks live on the RDD itself, reachable through
    * the `LogicalRDD` leaf the checkpoint returned. Falls back to
    * ContextCleaner GC if the plan shape ever changes.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.logical.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }

  /** Train `numMerges` BPE merges over the corpus. Returns the ranked
    * merge table. `minCount` stops early once the best pair drops below
    * it. Each iteration: one map + hash-agg + global top-1 on the word
    * table (TakeOrdered — one row to the driver), then a lineage-cutting
    * localCheckpoint of the re-symbolized words so iteration k doesn't
    * re-execute merges 1..k-1; the superseded checkpoint's RDD blocks
    * are freed eagerly via [[freeCheckpoint]].
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 16,
      minCount: Long = 2L, wordFilter: Column => Column = _ => lit(true))
      : Seq[Merge] = {
    var words = wordFreqs(df, textCol)
      .filter(wordFilter(col("word")))
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("n") < minCount) done = true
      else {
        val (a, b, n) = (top(0).getAs[String]("left"),
          top(0).getAs[String]("right"), top(0).getAs[Long]("n"))
        merges += Merge(rank, a, b, n)
        val next = words.select(mergePair(col("syms"), a, b).as("syms"),
          col("freq")).localCheckpoint(true)
        freeCheckpoint(words)
        words = next
        rank += 1
      }
    }
    freeCheckpoint(words)
    merges.result()
  }
}
