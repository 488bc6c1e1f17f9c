package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — Kudo 2018,
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates" (the public algorithm behind
  * SentencePiece's default model). Complements [[Bpe]] as the second
  * industry-standard tokenizer family: where BPE grows a vocab bottom-up
  * by merge rules, unigram-LM starts from a large substring seed and
  * EM-prunes down to the target size, then tokenizes by Viterbi best
  * segmentation under the learned piece probabilities.
  *
  * Scale shape (the [[Bpe.train]] contract): the corpus is touched ONCE
  * (word-frequency count, one shuffle); every EM iteration runs
  * partition-local over the DISTINCT-WORD table against the BROADCAST
  * vocab, reducing to one |vocab|-row aggregate — bounded by the model
  * size, not corpus bytes. Driver state is exactly the vocab map.
  *
  * Determinism: seeding, pruning, and final ranking all tie-break on
  * (count DESC, piece ASC), and EM expected counts are exact integer
  * sums of per-word quantized contributions ([[CountUnit]] — a double
  * accumulation through the shuffle aggregate would be
  * merge-order-dependent and FP noise near the prune cutoff would
  * reorder the vocab), so training is reproducible run-to-run and
  * cluster-size independent. For ORACLE-compared tokenization the piece
  * log-probs quantize to 1e9 integer units with the [[Ranking]] (BM25)
  * boundary assert, making the Viterbi objective — maximize Σ score_u,
  * tie-break minimum token count — exact BIGINT arithmetic in any
  * engine.
  */
object Unigram {

  /** Every substring of `word` with length 1..maxPieceLen, one entry
    * per (start, length) occurrence — the candidate-piece enumeration,
    * fully inside Catalyst (nested transform over sequence, no UDF).
    */
  def substringPieces(word: Column, maxPieceLen: Int): Column =
    flatten(transform(
      sequence(lit(1), length(word)),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(word) - i + 1)),
        l => word.substr(i, l))))

  /** Candidate-piece counts over a (word, freq) table: one explode +
    * hash-aggregate shuffle, weighted by word frequency, every
    * occurrence counted (overlaps included). ~len·maxPieceLen rows per
    * distinct word before the map-side partial aggregation.
    */
  def pieceCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("freq"),
        explode(substringPieces(col("word"), maxPieceLen)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Deterministic frequency vocab — the EM-free operating point the
    * oracle gate replays exactly: ALL single characters (so every word
    * stays segmentable) plus the `topPieces` highest-count multi-char
    * candidates, ties (cnt DESC, piece ASC). Returns piece → count.
    * Driver state: |vocab| rows, model-sized.
    */
  def frequencyVocab(words: DataFrame, maxPieceLen: Int,
      topPieces: Int): Map[String, Long] = {
    // persisted across the two collects: the candidate enumeration
    // (len·maxPieceLen rows per distinct word through a hash-agg
    // shuffle) is the heaviest pass here and would otherwise run twice
    val counts = pieceCounts(words, maxPieceLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chars = counts.filter(length(col("piece")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val multi = counts.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(topPieces)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      (chars ++ multi).toMap
    } finally { counts.unpersist(); () }
  }

  /** Quantize piece probabilities (∝ counts) to 1e9-unit integer
    * log-probs — the [[Ranking.bm25Train]] cross-engine protocol: the
    * one transcendental (ln) is computed once here and must land
    * ≥ 1e-4 units from a .5 rounding boundary (hundreds of ulps at
    * this magnitude), so an oracle engine's ln that disagrees by a few
    * ulps still rounds to the SAME integer; a pathological count pair
    * fails loudly here instead of flaking a downstream hash compare.
    * Every subsequent Viterbi comparison is exact BIGINT arithmetic.
    */
  def quantizedLogProbs(counts: Map[String, Long]): Map[String, Long] = {
    require(counts.nonEmpty, "empty vocab")
    val total = counts.values.sum.toDouble
    counts.map { case (piece, cnt) =>
      require(cnt > 0, s"piece '$piece' has non-positive count $cnt")
      val raw = math.log(cnt.toDouble / total) * 1e9
      val frac = math.abs(raw - math.floor(raw) - 0.5)
      require(frac > 1e-4,
        s"score_u($piece) = $raw lands within 1e-4 of a rounding " +
          "boundary; ln implementations may disagree across engines — " +
          "adjust the vocab size or quantum")
      piece -> math.round(raw)
    }
  }

  /** Viterbi best segmentation of one word under integer piece scores:
    * maximize Σ score_u; ties prefer FEWER tokens; remaining ties
    * prefer the longer piece ending at each position (smaller split
    * point) — fully deterministic. Returns None when the word cannot
    * be segmented from the vocab (never happens when all its single
    * chars are pieces). (score, n_tokens) is tie-unique by
    * construction: max score is unique, min n among max-score is
    * unique — the pair is what oracle gates compare.
    */
  def viterbiLocal(word: String, scoreU: Map[String, Long],
      maxPieceLen: Int): Option[(Array[String], Long)] = {
    val n = word.length
    if (n == 0) return Some((Array.empty[String], 0L))
    val NegInf = Long.MinValue
    val best = Array.fill(n + 1)(NegInf)
    val bestN = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L; bestN(0) = 0
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        val i = j - l
        if (best(i) != NegInf) {
          scoreU.get(word.substring(i, j)) match {
            case Some(s) =>
              val cand = best(i) + s
              val candN = bestN(i) + 1
              // longer piece (larger l) wins remaining ties: iterate l
              // ascending and accept equal-(score, n) candidates too,
              // so the LAST equal candidate (largest l) sticks
              if (cand > best(j) ||
                  (cand == best(j) && candN <= bestN(j))) {
                best(j) = cand; bestN(j) = candN; back(j) = i
              }
            case None => ()
          }
        }
        l += 1
      }
      j += 1
    }
    if (best(n) == NegInf) None
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { out += word.substring(back(p), p); p = back(p) }
      Some((out.reverseIterator.toArray, best(n)))
    }
  }

  /** SentencePiece's byte-fallback piece name for one UTF-8 byte. */
  def bytePiece(b: Int): String = f"<0x${b & 0xff}%02X>"

  /** Integer score charged PER FALLBACK BYTE token: ln p = −100 in the
    * 1e9-unit quantized protocol. Any trained piece scores ≥
    * ln(1/total)·1e9 ≥ −43.7e9 even for a 1-count piece against a
    * Long.MaxValue-total corpus, so a fallback byte (−100e9) is always
    * strictly worse than any vocab piece — and the arithmetic stays
    * exact BIGINT, replayable by an oracle engine.
    */
  val ByteFallbackScoreU: Long = -100000000000L

  /** Viterbi segmentation with SentencePiece-style byte-fallback: the
    * vocab-only lattice is tried FIRST and its result returned
    * untouched when a segmentation exists (so fallback mode is
    * bit-identical to [[viterbiLocal]] on every previously-segmentable
    * word); only an unsegmentable word re-runs the DP on a lattice
    * extended with one edge per CODE POINT whose single-character
    * piece is absent from the vocab, emitting that code point's UTF-8
    * bytes as `<0xXX>` tokens at [[ByteFallbackScoreU]] per byte.
    * Every code point has a UTF-8 encoding, so the extended lattice
    * always completes — an unseen-script word tokenizes instead of
    * returning None. Tie rules match [[viterbiLocal]] (max score, then
    * fewest tokens, then longer final piece); fallback edges are
    * considered after the vocab edges at each position.
    */
  def viterbiLocalWithByteFallback(word: String, scoreU: Map[String, Long],
      maxPieceLen: Int): (Array[String], Long) =
    viterbiLocal(word, scoreU, maxPieceLen).getOrElse {
      val n = word.length
      val NegInf = Long.MinValue
      val best = Array.fill(n + 1)(NegInf)
      val bestN = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1)
      val fb = new Array[Boolean](n + 1)
      best(0) = 0L; bestN(0) = 0
      var j = 1
      while (j <= n) {
        var l = 1
        val lMax = math.min(maxPieceLen, j)
        while (l <= lMax) {
          val i = j - l
          if (best(i) != NegInf) {
            scoreU.get(word.substring(i, j)) match {
              case Some(s) =>
                val cand = best(i) + s
                val candN = bestN(i) + 1
                if (cand > best(j) ||
                    (cand == best(j) && candN <= bestN(j))) {
                  best(j) = cand; bestN(j) = candN; back(j) = i
                  fb(j) = false
                }
              case None => ()
            }
          }
          l += 1
        }
        // fallback edge spanning the code point that ENDS at j (two
        // chars for a surrogate pair), only when that code point is
        // not itself a vocab piece
        val cpStart =
          if (j >= 2 && java.lang.Character.isLowSurrogate(word.charAt(j - 1))
              && java.lang.Character.isHighSurrogate(word.charAt(j - 2))) j - 2
          else j - 1
        val cp = word.substring(cpStart, j)
        if (best(cpStart) != NegInf && !scoreU.contains(cp)) {
          val nBytes = cp.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          val cand = best(cpStart) + nBytes * ByteFallbackScoreU
          val candN = bestN(cpStart) + nBytes
          if (cand > best(j) || (cand == best(j) && candN <= bestN(j))) {
            best(j) = cand; bestN(j) = candN; back(j) = cpStart
            fb(j) = true
          }
        }
        j += 1
      }
      // the extended lattice is total (every code point has an edge)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) {
        val i = back(p)
        if (fb(p))
          word.substring(i, p)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .reverseIterator.foreach(b => out += bytePiece(b))
        else out += word.substring(i, p)
        p = i
      }
      (out.reverseIterator.toArray, best(n))
    }

  /** Distributed Viterbi encode of a word table — one mapPartitions
    * with the quantized vocab as broadcast state (the
    * [[Bpe.encodeWordTable]] shape: plan depth constant in vocab size).
    * Output: (wordCol, pieces, n_pieces, score_u); unsegmentable words
    * surface with null pieces and null score rather than vanishing.
    */
  def encodeWords(words: DataFrame, scoreU: Map[String, Long],
      maxPieceLen: Int, wordCol: String = "word",
      byteFallback: Boolean = false): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(scoreU)
    words.select(col(wordCol).cast("string")).as[String]
      .mapPartitions { it =>
        val v = bc.value
        it.map { w =>
          if (byteFallback) {
            val (pieces, s) = viterbiLocalWithByteFallback(w, v, maxPieceLen)
            (w, pieces.toSeq, pieces.length.toLong, s)
          } else viterbiLocal(w, v, maxPieceLen) match {
            case Some((pieces, s)) =>
              (w, pieces.toSeq, pieces.length.toLong, s)
            case None => (w, null: Seq[String], -1L, 0L)
          }
        }
      }.toDF(wordCol, "pieces", "n_pieces", "score_u")
      .withColumn("pieces",
        when(col("n_pieces") >= 0, col("pieces")))
      .withColumn("score_u",
        when(col("n_pieces") >= 0, col("score_u")))
      .withColumn("n_pieces",
        when(col("n_pieces") >= 0, col("n_pieces")))
  }

  /** Corpus tokenization under a quantized unigram vocab — the
    * [[Bpe.encodeCorpus]] composition verbatim: positioned words
    * explode once (corpus-bounded map), the DISTINCT-word table is
    * Viterbi-encoded partition-locally (vocabulary-bounded), token
    * arrays join back for an ordered per-document flatten. Output:
    * (idCol, tokens, n_tokens).
    */
  def encodeCorpus(df: DataFrame, scoreU: Map[String, Long],
      maxPieceLen: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val positioned = df
      .select(col(idCol).as("id"),
        posexplode_outer(filter(split(col(textCol), " "), w => w =!= ""))
          .as(Seq("pos", "word")))
    val encoded = encodeWords(
      positioned.select("word").filter(col("word").isNotNull).distinct(),
      scoreU, maxPieceLen)
      .select(col("word"), coalesce(col("pieces"),
        array().cast("array<string>")).as("tokens"))
    // secondary-sort ordered flatten — see Bpe.orderedFlatten
    Bpe.orderedFlatten(positioned.join(encoded, Seq("word"), "left"), idCol)
  }

  // ------------------------------------------------------------ EM

  /** Per-word expected-count quantum: each word's per-piece posterior
    * mass is rounded to these units BEFORE any cross-word summation,
    * so every downstream reduction is exact integer arithmetic —
    * order-free, hence bit-reproducible across partitionings and
    * cluster sizes (double accumulation through a shuffle aggregate is
    * merge-order-dependent, and prune ranks on these counts: FP noise
    * near the cutoff would make training non-reproducible). Bound:
    * per-piece expected mass must stay under Long.MaxValue/1e6 ≈
    * 9.2e12 — a piece's mass is capped by the corpus's (weighted)
    * occurrences of that piece, so this holds to ~10-trillion-token
    * corpora; widen the quantum past that.
    */
  private val CountUnit = 1e6

  /** Forward-backward rescale trigger/step: values below 2^-256 are
    * scalb'd up by 2^512 and the shift tracked in a per-position
    * exponent. Far above the double denormal floor (so precision is
    * never lost before the rescale) and far below any posterior a
    * short word produces (so typical words never rescale and keep
    * bit-identical counts).
    */
  private val ScaleFloor = java.lang.Math.scalb(1.0, -256)
  private val ScaleShift = 512

  /** One E-step: expected piece counts over all segmentations of every
    * word (forward-backward over each word, partition-local against
    * the broadcast vocab), reduced to ONE |vocab|-row aggregate and
    * collected — driver state stays model-sized. Unsegmentable words
    * contribute nothing (their chars are not in the vocab at all).
    * Deterministic across partitionings: see [[CountUnit]].
    */
  def expectedCounts(words: DataFrame, vocab: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    words.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val v = bc.value
        val acc = new java.util.HashMap[String, Long]()
        it.foreach { case (w, f) =>
          val n = w.length
          if (n > 0) {
            // Per-position POWER-OF-TWO rescaling (the HMM scaling
            // trick, exponent-only): in plain linear space alpha/beta
            // are products of ~n piece probabilities (p ~ 1/|vocab|),
            // which underflow to 0 for long words — the word then
            // silently vanishes from EM (z == 0), and a degenerate
            // corpus could trip the "EM step saw no segmentable words"
            // require spuriously. Each position carries an exponent
            // offset (alpha_true(j) = alpha(j)·2^expA(j)); when a
            // freshly computed value drops below 2^-256 it is scalb'd
            // up by 512. Power-of-two scaling is EXACT in binary FP,
            // and the posterior below re-applies the exponents through
            // scalb, so for every word that never triggers a rescale
            // (all exponents 0) the quantized counts are BIT-IDENTICAL
            // to the unscaled computation — the cross-partitioning
            // determinism contract is untouched.
            val alpha = new Array[Double](n + 1); alpha(0) = 1.0
            val expA = new Array[Int](n + 1)
            var j = 1
            while (j <= n) {
              expA(j) = expA(j - 1)
              var l = 1; val lm = math.min(maxPieceLen, j)
              while (l <= lm) {
                if (alpha(j - l) > 0) v.get(w.substring(j - l, j)) match {
                  case Some(p) => alpha(j) += math.scalb(alpha(j - l) * p,
                    expA(j - l) - expA(j))
                  case None => ()
                }
                l += 1
              }
              if (alpha(j) > 0 && alpha(j) < ScaleFloor) {
                alpha(j) = math.scalb(alpha(j), ScaleShift)
                expA(j) -= ScaleShift
              }
              j += 1
            }
            val z = alpha(n)
            if (z > 0) {
              val beta = new Array[Double](n + 1); beta(n) = 1.0
              val expB = new Array[Int](n + 1)
              var i = n - 1
              while (i >= 0) {
                expB(i) = expB(i + 1)
                var l = 1; val lm = math.min(maxPieceLen, n - i)
                while (l <= lm) {
                  if (beta(i + l) > 0) v.get(w.substring(i, i + l)) match {
                    case Some(p) => beta(i) += math.scalb(p * beta(i + l),
                      expB(i + l) - expB(i))
                    case None => ()
                  }
                  l += 1
                }
                if (beta(i) > 0 && beta(i) < ScaleFloor) {
                  beta(i) = math.scalb(beta(i), ScaleShift)
                  expB(i) -= ScaleShift
                }
                i -= 1
              }
              // per-WORD double accumulation (fixed inner order — a
              // deterministic function of the word alone), quantized
              // ONCE per word so every cross-word sum is exact integers
              val wordAcc = new java.util.HashMap[String, Double]()
              i = 0
              while (i < n) {
                var l = 1; val lm = math.min(maxPieceLen, n - i)
                while (l <= lm) {
                  val piece = w.substring(i, i + l)
                  v.get(piece) match {
                    case Some(p) =>
                      // exponents re-applied through scalb: exact, and
                      // a literal no-op (shift 0) for unscaled words
                      val post = math.scalb(alpha(i) * p * beta(i + l) / z,
                        expA(i) + expB(i + l) - expA(n))
                      if (post > 0)
                        wordAcc.merge(piece, post, (a, b) => a + b)
                    case None => ()
                  }
                  l += 1
                }
                i += 1
              }
              val wIt = wordAcc.entrySet().iterator()
              while (wIt.hasNext) {
                val e = wIt.next()
                val units = math.rint(e.getValue * f * CountUnit).toLong
                if (units != 0L)
                  acc.merge(e.getKey, units, (a, b) => a + b)
              }
            }
          }
        }
        scala.jdk.CollectionConverters.MapHasAsScala(acc).asScala.iterator
      }
      .toDF("piece", "c")
      .groupBy("piece").agg(sum(col("c")).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1) / CountUnit).toMap
  }

  /** One EM iteration: E-step expected counts, M-step renormalize.
    * Pieces with zero expected count (they occur in no segmentable
    * word) drop out.
    */
  def emStep(words: DataFrame, vocab: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val counts = expectedCounts(words, vocab, maxPieceLen)
    val total = counts.values.sum
    require(total > 0, "EM step saw no segmentable words")
    counts.map { case (p, c) => p -> c / total }
  }

  /** Deterministic prune to `keep` pieces: single characters are
    * never pruned (they guarantee segmentability — SentencePiece's
    * required-character rule); multi-char pieces survive by
    * (expected count DESC, piece ASC). Probabilities renormalize over
    * the survivors' counts.
    */
  def prune(counts: Map[String, Double], keep: Int): Map[String, Double] = {
    val (chars, multi) = counts.toSeq.partition(_._1.length == 1)
    val nMulti = math.max(0, keep - chars.length)
    val kept = chars ++ multi.sortBy { case (p, c) => (-c, p) }.take(nMulti)
    val total = kept.map(_._2).sum
    require(total > 0, "prune left no probability mass")
    kept.map { case (p, c) => p -> c / total }.toMap
  }

  /** Train a unigram-LM vocab of `vocabSize` pieces: frequency-seeded
    * candidates, then alternating EM and prune rounds (each round
    * drops `pruneFraction` of the multi-char pieces until the target
    * size is reached), then `polishIters` final EM passes. Returns
    * piece → probability. The corpus is touched once (word count);
    * every round is one word-table pass; driver state is the vocab.
    */
  def train(df: DataFrame, textCol: String = "text", vocabSize: Int = 512,
      maxPieceLen: Int = 4, seedSize: Int = 4096, polishIters: Int = 1,
      pruneFraction: Double = 0.25,
      wordFilter: Column => Column = _ => lit(true)): Map[String, Double] = {
    require(vocabSize > 0 && seedSize >= vocabSize,
      "need seedSize >= vocabSize > 0")
    val words = Bpe.wordFreqs(df, textCol)
      .filter(wordFilter(col("word")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedCounts = frequencyVocab(words, maxPieceLen, seedSize)
      val seedTotal = seedCounts.values.sum.toDouble
      var vocab = seedCounts.map { case (p, c) => p -> c / seedTotal }
      var shrinking = true
      while (vocab.size > vocabSize && shrinking) {
        val counts = expectedCounts(words, vocab, maxPieceLen)
        val target = math.max(vocabSize,
          (vocab.size * (1.0 - pruneFraction)).toInt)
        val next = prune(counts, target)
        // single chars are never pruned, so a charset larger than the
        // target is a floor, not a loop: stop once pruning stagnates
        shrinking = next.size < vocab.size
        vocab = next
      }
      var i = 0
      while (i < polishIters) { vocab = emStep(words, vocab, maxPieceLen); i += 1 }
      vocab
    } finally { words.unpersist(); () }
  }
}
