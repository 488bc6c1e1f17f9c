package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich worked example: vocabulary with shared subwords
  private lazy val corpus = Seq(
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 as a text corpus
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
  ).toDF("text")

  test("wordFreqs counts whitespace words once per occurrence") {
    val f = Bpe.wordFreqs(corpus).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }

  test("pairCounts weights adjacent pairs by word frequency") {
    val words = Bpe.wordFreqs(corpus)
      .select(Bpe.charSymbols(col("word")).as("syms"), col("freq"))
    val pc = Bpe.pairCounts(words).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "es" appears in newest(6) + widest(3); "st" the same; "lo" in low+lower
    assert(pc(("e", "s")) == 9L)
    assert(pc(("s", "t")) == 9L)
    assert(pc(("l", "o")) == 7L)
    assert(pc(("w", "e")) == 8L) // newest(6) + lower(2)
  }

  test("mergePair merges left-to-right without overlap") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("x"), Seq.empty[String]).toDF("syms")
    val out = df.select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a")) // non-overlapping, leftmost first
    assert(out(1) == Seq("a", "b", "a", "b"))
    assert(out(2) == Seq("x"))
    assert(out(3) == Seq.empty[String])
    val out2 = df.select(Bpe.mergePair(col("syms"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out2(1) == Seq("ab", "ab"))
  }

  test("train learns the reference merge sequence on the worked example") {
    val merges = Bpe.train(corpus, numMerges = 4)
    // hand-derived with (count DESC, left ASC, right ASC) tie-break:
    // 1. (e,s) 9  2. (es,t) 9  3. (l,o) 7  4. (lo,w) 7
    assert(merges.map(m => (m.left, m.right, m.n)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("train stops early when the best pair drops below minCount") {
    val tiny = Seq("ab ab cd").toDF("text")
    val merges = Bpe.train(tiny, numMerges = 10, minCount = 2)
    // (a,b) count 2 merges; everything else is count 1 < minCount
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("applyMerges encodes with the learned table; encoding is stable") {
    val merges = Bpe.train(corpus, numMerges = 4)
    val table = merges.map(m => (m.left, m.right))
    val enc = Seq("lowest").toDF("word")
      .select(Bpe.applyMerges(Bpe.charSymbols(col("word")), table).as("t"))
      .head().getSeq[String](0)
    // low + est: (e,s)→es, (es,t)→est, (l,o)→lo, (lo,w)→low
    assert(enc == Seq("low", "es", "t") || enc == Seq("low", "est"))
    // exact: merge ranks apply in order; est forms from es+t
    assert(enc == Seq("low", "est"))
    // token count never increases under more merges
    val enc0 = Seq("lowest").toDF("word")
      .select(Bpe.applyMerges(Bpe.charSymbols(col("word")), table.take(2)).as("t"))
      .head().getSeq[String](0)
    assert(enc0.length >= enc.length)
  }

  test("train is invariant under corpus repartitioning") {
    val docs = (0 until 50).map(i => s"alpha beta gamma$i alpha").toDF("text")
    val m1 = Bpe.train(docs, numMerges = 3)
    val m2 = Bpe.train(docs.repartition(13), numMerges = 3)
    assert(m1 == m2)
  }

  test("encodeSymbols equals applyMerges on trained (well-formed) tables") {
    // richer corpus than the worked example: random-ish words over a
    // small alphabet generate deep multi-char merge chains
    val words = (0 until 200).map { i =>
      val cs = "abcde"
      (0 to (i % 7) + 1).map(j => cs((i * 31 + j * 17) % cs.length)).mkString
    }
    val docs = Seq(words.mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, numMerges = 24, minCount = 1)
    val table = merges.map(m => (m.left, m.right))
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val viaExpr = Seq(words).flatten.toDF("word")
      .select(col("word"),
        Bpe.applyMerges(Bpe.charSymbols(col("word")), table).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.distinct.foreach { w =>
      val got = Bpe.encodeSymbols(w.split(""), ranks).toSeq
      assert(got == viaExpr(w), s"word $w: $got != ${viaExpr(w)}")
    }
  }

  test("encodeWordTable handles a 1.2k-entry table at constant plan depth") {
    // doubling chain: rank 0 merges (a,b); rank r merges the rank-(r-1)
    // symbol with itself — "ab"×512 collapses to ONE 1024-char token
    // only if the chain applies strictly in rank order; the table is
    // then padded to 1200 entries (production vocab size class), which
    // must change nothing
    val word = "ab" * 512
    val chain = Bpe.Merge(0, "a", "b", 1L) +: (1 to 9).map { r =>
      val s = "ab" * (1 << (r - 1))
      Bpe.Merge(r, s, s, 1L)
    }
    val table = Bpe.padMerges(chain, 1200)
    assert(table.length == 1200)
    val out = Bpe.encodeWordTable(Seq(word, "zz").toDF("word"), table)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out(word) == Seq(word)) // fully merged through the chain
    assert(out("zz") == Seq("z", "z")) // untouched by the table
    // plan depth must not scale with table size: same node count as the
    // bare 10-merge chain (the fold-expression encoder grows linearly)
    def planNodes(ms: Seq[Bpe.Merge]): Int =
      Bpe.encodeWordTable(Seq(word).toDF("word"), ms)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes(table) == planNodes(chain))
  }

  test("encodeCorpus: ordered per-doc streams, replay-equal, mass-conserving") {
    // docs 4/5: empty and whitespace-only — they must SURVIVE as
    // ([], 0) rows (an inner explode+join silently dropped them,
    // breaking downstream joins of token streams back onto the corpus)
    val corpus = Seq(
      (1L, "low lower lowest low"),
      (2L, "new newer lowest"),
      (3L, "low"),
      (4L, ""),
      (5L, "   ")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, numMerges = 8, minCount = 1)
    val out = Bpe.encodeCorpus(corpus, merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[String](1).toList, r.getAs[Long]("n_tokens"))).toMap
    // replay: encode each word independently in rank order, reassemble
    val table = merges.map(m => (m.left, m.right))
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    def enc(w: String): List[String] =
      Bpe.encodeSymbols(w.split(""), ranks).toList
    val expected = Map(
      1L -> "low lower lowest low", 2L -> "new newer lowest", 3L -> "low")
      .map { case (id, t) => id -> t.split(" ").toList.flatMap(enc) }
    for (id <- Seq(1L, 2L, 3L)) {
      assert(out(id)._1 == expected(id),
        s"doc $id stream must equal the per-word rank-order replay in order")
      assert(out(id)._2 == expected(id).size.toLong,
        s"doc $id token mass must be conserved")
    }
    // repeated words encode identically at every position (doc 1: 'low' twice)
    assert(out(1L)._1.take(enc("low").size) == enc("low"))
    assert(out(1L)._1.takeRight(enc("low").size) == enc("low"))
    // wordless docs present with empty streams, not absent
    assert(out(4L) == (Nil, 0L) && out(5L) == (Nil, 0L),
      s"empty/whitespace docs must yield ([], 0): ${out.get(4L)}, ${out.get(5L)}")
  }

  test("encodeCorpus stream order survives multi-partition shuffled input " +
      "(secondary-sort join-back)") {
    // r19 rebuilds the ordered stream by sorting (id, pos) within the
    // repartition-by-id exchange and collecting in arrival order, so the
    // order guarantee must hold when the input arrives shuffled across
    // many partitions — not just on a single tidy partition. 60 docs ×
    // up to 40 words, ids deliberately interleaved across 13 partitions.
    val words = Seq("low", "lower", "lowest", "new", "newer", "wide", "er")
    val rows = (0L until 60L).map { id =>
      val n = 1 + (id % 40).toInt
      val text = (0 until n)
        .map(i => words(((id + i * 7) % words.length).toInt)).mkString(" ")
      (id, text)
    }
    val corpus = rows.toDF("doc_id", "text")
      .repartition(13, col("doc_id") * 31 % 13) // scatter ids
    val merges = Bpe.train(rows.take(8).toSeq.toDF("doc_id", "text"),
      numMerges = 6, minCount = 1)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val out = Bpe.encodeCorpus(corpus, merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[String](1).toList, r.getAs[Long]("n_tokens"))).toMap
    assert(out.size == 60)
    rows.foreach { case (id, text) =>
      val expected = text.split(" ").toList
        .flatMap(w => Bpe.encodeSymbols(w.split(""), ranks))
      assert(out(id)._1 == expected,
        s"doc $id stream out of order under multi-partition input")
      assert(out(id)._2 == expected.size.toLong)
    }
  }

  test("padMerges entries are provably inert") {
    val merges = Bpe.train(corpus, numMerges = 4)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val padded = Bpe.padMerges(merges, 1200)
    assert(padded.length == 1200)
    assert(padded.map(_.rank) == (0 until 1200))
    val padRanks = padded.map(m => (m.left, m.right) -> m.rank).toMap
    for (w <- Seq("lowest", "newest", "wider", "low"))
      assert(Bpe.encodeSymbols(w.split(""), padRanks).toSeq ==
        Bpe.encodeSymbols(w.split(""), ranks).toSeq)
  }
}
