package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the LLM-operator hot paths.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * CodegenFallback and evaluate their lambda per element through the
  * interpreted path; worse, an expensive collection argument nested inside
  * an outer lambda is re-evaluated once per outer element. A k=32 MinHash
  * written with HOFs therefore rebuilds the shingle array 32× per row.
  * These expressions replace those trees with single-pass loops over
  * ArrayData — one call per ROW instead of per element.
  *
  * All of them implement `doGenCode` (none are CodegenFallback): a
  * fallback expression doesn't just eval interpreted, it makes
  * `CollapseCodegenStages` refuse whole-stage codegen for the ENTIRE
  * stage containing it, so every sibling expression in the projection
  * drops to the interpreted path too. The generated code evaluates the
  * child inside the stage's fused loop and makes one call into the
  * JIT-compiled `compute*` method via a reference object — the same
  * shape Spark's own `Invoke`-backed expressions produce.
  * `NativeCodegenSpec` asserts the stages stay whole-stage-compiled.
  *
  * Everything is deterministic pure-function-of-input, so results are
  * stable across executors/retries — required for the driver's
  * hash-compare and for shuffle-replay correctness at scale.
  */
object hashing {
  /** splitmix64 finalizer — cheap well-mixed 64-bit permutation. */
  @inline final def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** xxhash64 of a UTF8String with Spark's seed convention. */
  @inline final def hashString(s: UTF8String, seed: Long): Long =
    XxHash64Function.hash(s, StringType, seed)
}

/** Shared codegen shape for the unary expressions: evaluate the child in
  * the fused stage loop, call one JIT-compiled method on the expression
  * instance (shipped as a codegen reference object). Implementors expose
  * the method as `compute` returning the boxed/eval representation and
  * declare its exact generated-code invocation via [[computeCall]].
  */
private[expr] trait NativeUnaryCodegen { self: UnaryExpression =>
  /** Java source for assigning `ev.value` from `$ref.compute*($child)`. */
  protected def computeCall(ref: String, child: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${computeCall(ref, c)};")
  }
}

/** Distinct word n-gram shingles of a token array (first-occurrence
  * order). Tokens shorter than n yield one whole-text shingle so every
  * document participates in dedup.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  def compute(toks: ArrayData): ArrayData = {
    val size = toks.numElements()
    val count = math.max(size - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val upper = math.min(i + n, size)
      val parts = new Array[UTF8String](upper - i)
      var j = i
      while (j < upper) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** k-hash MinHash signature over an array<string> shingle set: each
  * shingle is xxhash64'd once, then remixed per hash index — one pass,
  * k·|shingles| cheap mixes instead of k full rehashes.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => hashing.mix64(0x5eed0000L + j))

  def compute(arr: ArrayData): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = hashing.hashString(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < k) {
        val hj = hashing.mix64(h ^ seeds(j))
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** 64-bit SimHash over an array<string> token multiset: per-token hash,
  * per-bit majority vote — O(|tokens|·64) in one pass.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def computeLong(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.numElements()) {
      val h = hashing.hashString(toks.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(computeLong(input.asInstanceOf[ArrayData]))
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.computeLong($c)"
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Polynomial rolling hash over an array<string> token column (Rabin-Karp
  * document signature): Horner's rule acc·31 + xxhash64(token) mod 2^64 —
  * order-sensitive, one pass. Replaces the HOF `aggregate` formulation,
  * which pays an interpreted lambda call per token (the pattern this file
  * exists to avoid).
  */
case class RollingHash64(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  def computeLong(toks: ArrayData): Long = {
    var acc = 0L
    var i = 0
    while (i < toks.numElements()) {
      acc = acc * 31L + hashing.hashString(toks.getUTF8String(i), 42L)
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(computeLong(input.asInstanceOf[ArrayData]))
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.computeLong($c)"
  override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(child = c)
}

/** DEFLATE compression ratio of a string column: compressed bytes /
  * raw UTF-8 bytes (empty string → 1.0). The classic corpus-quality
  * signal — boilerplate, template spam, and repeated n-grams compress
  * far better than fluent prose, so a low ratio flags machine-generated
  * or degenerate documents (used alongside the Gopher rules; see
  * `TextAnalysis.compressionRatio`).
  *
  * One `java.util.zip.Deflater` (raw/nowrap, default level) and one 8 KiB
  * scratch buffer are kept per executor THREAD and reset per row —
  * allocating the native zlib stream per row would dominate the cost.
  * Only the compressed SIZE is kept; output bytes are discarded as they
  * stream through the scratch buffer, so memory stays O(8 KiB) per
  * thread no matter how large the document. Deterministic for a fixed
  * zlib level across rows/retries on the same JVM; gate oracles pin
  * bounds and orderings (which are zlib-version-stable), never raw
  * byte counts.
  */
/** Unicode NFC normalization (canonical composition) — the text
  * canonicalization a crawl pipeline applies before any hashing or
  * dedup: the same page crawled from sources emitting composed vs
  * decomposed code points ("é" as one code point vs "e"+U+0301) must
  * fingerprint identically, or every hash-keyed operator silently
  * treats them as distinct documents. `java.text.Normalizer` is the
  * JDK's implementation of UAX #15, the same algorithm DuckDB's
  * `nfc_normalize` implements, so outputs are byte-equal across the
  * oracle pair (normalization of assigned code points is stable across
  * Unicode versions by policy). Fast path: `isNormalized` returns the
  * input UTF8String untouched for the already-NFC majority — no
  * String round-trip, no allocation.
  */
/** Single-pass multi-pattern literal replacement: one left-to-right
  * scan applying `pairs` (find → replacement) instead of one full
  * string rebuild per pattern the equivalent `replace` chain pays.
  * Equivalent to that chain — in any order — iff the pattern set is
  * scan-safe: no pattern is a prefix of another, no proper suffix of
  * one pattern is a prefix of another (so matches sit at the same
  * positions no matter which applies first), and no replacement
  * contains any character occurring in any pattern (so a rewrite can
  * never seed a new match, even one straddling untouched adjacent
  * text). Validated once per instance at table build; the
  * mojibake table is the motivating user (11 chained rebuilds → 1
  * scan, and a hit-free string returns UNTOUCHED — the clean-corpus
  * fast path at 100 TB is find-first-lead-char and bail).
  */
case class ReplaceMany(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "replace_many"

  @transient private lazy val byLead: java.util.HashMap[Character, Array[(String, String)]] = {
    require(pairs.nonEmpty && pairs.forall(_._1.nonEmpty), "empty pattern")
    for ((a, _) <- pairs; (b, _) <- pairs if a != b) {
      require(!b.startsWith(a), s"pattern '$a' is a prefix of '$b'")
      (1 until a.length).foreach { i =>
        require(!b.startsWith(a.substring(i)),
          s"suffix of '$a' is a prefix of '$b' — order-dependent")
      }
    }
    // a replacement char occurring ANYWHERE in any pattern (not just as
    // a lead) can seed a new match against adjacent untouched text
    // (e.g. (ab→X),(cX→Y) on "cab": the chain yields "Y", the scan
    // "cX") — ban every pattern char, which is what actually makes the
    // scan order-independent
    val patternChars = pairs.flatMap(_._1).toSet
    for ((_, r) <- pairs; c <- r)
      require(!patternChars.contains(c),
        s"replacement '$r' contains a pattern char '$c'")
    val m = new java.util.HashMap[Character, Array[(String, String)]]()
    pairs.groupBy(_._1.charAt(0)).foreach { case (c, ps) =>
      m.put(c, ps.toArray)
    }
    m
  }

  def computeUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val tbl = byLead
    var first = -1
    var i = 0
    while (first < 0 && i < n) {
      if (tbl.containsKey(str.charAt(i))) first = i
      i += 1
    }
    if (first < 0) return s
    val sb = new java.lang.StringBuilder(n)
    sb.append(str, 0, first)
    i = first
    while (i < n) {
      val cands = tbl.get(str.charAt(i))
      var advanced = false
      if (cands != null) {
        var k = 0
        while (!advanced && k < cands.length) {
          val p = cands(k)
          if (str.startsWith(p._1, i)) {
            sb.append(p._2); i += p._1.length; advanced = true
          }
          k += 1
        }
      }
      if (!advanced) { sb.append(str.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    computeUtf8(input.asInstanceOf[UTF8String])
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.computeUtf8($c)"
  override protected def withNewChildInternal(c: Expression): ReplaceMany = copy(child = c)
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  def computeUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    computeUtf8(input.asInstanceOf[UTF8String])
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.computeUtf8($c)"
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

case class DeflateRatio(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {
  import DeflateRatio.{deflaters, scratch}
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  def computeDouble(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = deflaters.get()
    val buf = scratch.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(computeDouble(input.asInstanceOf[UTF8String]))
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.computeDouble($c)"
  override protected def withNewChildInternal(c: Expression): DeflateRatio = copy(child = c)
}

/** JVM-wide (static) per-thread Deflater pool: shared across every
  * DeflateRatio instance so a long-lived executor running many queries
  * holds at most one native zlib stream per thread, not one per
  * (expression instance × thread). `end()` is never called — the pool
  * lives for the executor's lifetime by design, bounded by thread
  * count, and is reclaimed by the Deflater Cleaner on JVM exit.
  */
object DeflateRatio {
  private val deflaters =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
    }
  private val scratch =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](8192)
    }
}

/** Marker-profile language ID over an array<string> token column: one
  * pass over the tokens incrementing per-language marker counts, then
  * argmax with (score, language-code) tie-break — identical semantics to
  * sorting (score, lang) structs descending and taking the head, at a
  * single token-set lookup per token per language.
  */
case class LangId(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val markerSets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { case (_, ms) =>
      val s = new java.util.HashSet[UTF8String](ms.size * 2)
      ms.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }.toArray
  private val und = UTF8String.fromString("und")

  def compute(toks: ArrayData): UTF8String = {
    val scores = new Array[Int](langs.length)
    var i = 0
    while (i < toks.numElements()) {
      // normalize case here so the SQL surface and the Column API agree
      val t = toks.getUTF8String(i).toLowerCase
      var l = 0
      while (l < langs.length) {
        if (markerSets(l).contains(t)) scores(l) += 1
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < langs.length) {
      // higher score wins; on ties the lexicographically greater code wins
      // (matches sort_array(desc) over (score, lang) structs)
      if (scores(l) > scores(best) ||
        (scores(l) == scores(best) && langs(l).compareTo(langs(best)) > 0))
        best = l
      l += 1
    }
    if (scores(best) > 0) langs(best) else und
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.unsafe.types.UTF8String) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
}

/** Count of array<string> elements contained in a fixed string set
  * (occurrence count, not distinct) — replaces the interpreted
  * size(filter(toks, isin...)) HOF tree in the text-stats hot path with
  * one hash-set probe per token.
  */
case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  def computeLong(toks: ArrayData): Long = {
    var n = 0L
    var i = 0
    while (i < toks.numElements()) {
      if (set.contains(toks.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(computeLong(input.asInstanceOf[ArrayData]))
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.computeLong($c)"
  override protected def withNewChildInternal(c: Expression): CountInSet = copy(child = c)
}

/** Sequential dot product of two array<double> columns — identical
  * accumulation order to `aggregate(zip_with(a,b,*),0,+)` (so results are
  * bit-compatible with the double-precision oracle) at a fraction of the
  * cost. The loop is emitted INLINE into the generated stage — the one
  * expression hot enough (corpus×queries evaluations in brute-force
  * top-k) that even the per-row reference-object call is worth skipping.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** Random-hyperplane sign sketches for `nTables` LSH tables in one pass:
  * returns array<long> of nBits-bit bucket ids. Plane components are a
  * deterministic function of (table, bit, dim index) via splitmix64 —
  * every executor derives identical planes with zero broadcast state.
  */
case class SignSketches(child: Expression, nTables: Int, nBits: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(nTables >= 1 && nBits >= 1 && nBits <= 63)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketches"

  def compute(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        // pre-mix the (table, bit) pair so adding the dim index j can
        // never alias a neighbouring bit's plane, whatever the dim count
        val planeSeed = hashing.mix64((t.toLong << 32) | b.toLong)
        var proj = 0.0
        var j = 0
        while (j < dim) {
          // component in [-1, 1]
          val w = hashing.mix64(planeSeed + j).toDouble / Long.MaxValue.toDouble
          proj += v.getDouble(j) * w
          j += 1
        }
        if (proj > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): SignSketches = copy(child = c)
}

/** Indexes of the `nProbe` nearest centroids (by cosine, descending;
  * ties break to the lower index) for an array<double> vector. The
  * centroid matrix is baked into the expression as a literal — exactly
  * the IVF coarse-quantizer pattern: the quantizer is tiny broadcast
  * state, assignment is a pure map over the scan with NO join or
  * row-explosion, and every executor evaluates the same planes.
  */
case class NearestCentroids(child: Expression,
    centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(nProbe >= 1 && nProbe <= centroids.size)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  // |v| is constant across centroids for a given row, so scoring by
  // dot/|c| preserves the cosine ordering without the extra sqrt
  @transient private lazy val invNorms: Array[Double] = cents.map { c =>
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) 0.0 else 1.0 / n
  }

  def compute(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val scores = new Array[Double](cents.length)
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var acc = 0.0
      var j = 0
      val n = math.min(dim, c.length)
      while (j < n) { acc += v.getDouble(j) * c(j); j += 1 }
      scores(ci) = acc * invNorms(ci)
      ci += 1
    }
    // selection of the top nProbe (k and nProbe are both small)
    val out = new Array[Any](nProbe)
    val taken = new Array[Boolean](cents.length)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var i = 0
      while (i < cents.length) {
        if (!taken(i) && (best < 0 || scores(i) > scores(best))) best = i
        i += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

/** Product-quantization encode (Jégou et al. 2011): split an
  * array<double> vector into `codebooks.length` contiguous subvectors
  * and emit, per subspace, the index of the L2-nearest codeword — the
  * vector's PQ code (array<int>, one byte of entropy per subspace at
  * K≤256). The codebook tensor is baked in as a literal, the same
  * tiny-broadcast-state pattern as [[NearestCentroids]]: encoding is a
  * pure codegen'd map over the scan, no join, no explosion. Ties break
  * to the lower codeword index (deterministic across engines).
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with NativeUnaryCodegen {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one non-empty codebook")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDim: Int = cbs(0)(0).length

  def compute(v: ArrayData): ArrayData = {
    val m = cbs.length
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val cb = cbs(mi)
      val off = mi * subDim
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = (if (off + j < v.numElements()) v.getDouble(off + j) else 0.0) - c(j)
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Asymmetric-distance computation (ADC) between an EXACT query vector
  * and a PQ code: Σ_m ‖q_m − codebook_m[code_m]‖² — the compressed-
  * domain scan distance of a PQ index (query stays exact, corpus is
  * codes). O(M·subDim) per pair over the baked-in codebook literal,
  * fully inside whole-stage codegen; at scale the scan reads M bytes
  * per corpus vector instead of the full float payload.
  */
case class PqAdcDist(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc_dist needs at least one non-empty codebook")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dist"

  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDim: Int = cbs(0)(0).length

  def compute(q: ArrayData, codes: ArrayData): Double = {
    val m = math.min(cbs.length, codes.numElements())
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val c = cbs(mi)(codes.getInt(mi))
      val off = mi * subDim
      var j = 0
      while (j < subDim) {
        val x = (if (off + j < q.numElements()) q.getDouble(off + j) else 0.0) - c(j)
        acc += x * x
        j += 1
      }
      mi += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(
      compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.compute($q, $c);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDist =
    copy(left = l, right = r)
}

/** Positioned token k-gram hashes: element i (0-based) is a 64-bit
  * order-sensitive hash of tokens [i, i+k); empty when the doc has
  * fewer than k tokens. Each token is xxhash64'd ONCE, then each
  * k-gram chains the per-token hashes through `mix64` — one pass with
  * zero string allocation, replacing the CodegenFallback
  * transform(slice → array_join → xxhash64) tree that builds a joined
  * k-token string per position. The value is only ever an internal
  * grouping key (the oracle twin groups by the gram TEXT), so the hash
  * convention is free to favor speed over compatibility.
  */
case class TokenKgramHashes(child: Expression, k: Int,
    distinct: Boolean = false)
    extends UnaryExpression with NativeUnaryCodegen {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_kgram_hashes"

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val count = n - k + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = hashing.hashString(toks.getUTF8String(i), 42L)
      i += 1
    }
    // distinct = true: first-occurrence dedup INSIDE the pass (the
    // doc-frequency consumers' shape) — same elements a downstream
    // array_distinct would keep, minus its extra array walk
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](count * 2)
      else null
    val out = new Array[Long](count)
    var m = 0
    i = 0
    while (i < count) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < k) { h = hashing.mix64(h ^ th(i + j)); j += 1 }
      if (seen == null || seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == count) out else java.util.Arrays.copyOf(out, m))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): TokenKgramHashes =
    copy(child = c)
}

/** 128-bit positioned token k-gram hashes: element i is a
  * struct<h1:bigint,h2:bigint> of two INDEPENDENT 64-bit chain hashes of
  * tokens [i, i+k) (per-token xxhash64 under two different seeds, each
  * chained through `mix64` from a distinct initial state). One pass,
  * both lanes computed from the same token scan.
  *
  * Exists for DESTRUCTIVE consumers ([[graft.llm.Dedup.dropRepeatedSpans]]):
  * with 64-bit keys a corpus of ~2^32 distinct grams (reached well below
  * 100 TB) makes birthday collisions certain, and a false "repeated" gram
  * would delete real tokens. Two independent 64-bit lanes push the
  * birthday bound to ~2^64 grams — unreachable. Non-destructive
  * consumers (span STATISTICS) keep the cheaper 64-bit
  * [[TokenKgramHashes]], where a collision only perturbs a count.
  */
case class TokenKgramHashes128(child: Expression, k: Int,
    distinct: Boolean = false)
    extends UnaryExpression with NativeUnaryCodegen {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_kgram_hashes128"

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val count = n - k + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val ta = new Array[Long](n)
    val tb = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      ta(i) = hashing.hashString(s, 42L)
      tb(i) = hashing.hashString(s, 1042L)
      i += 1
    }
    if (distinct) return computeDistinct(ta, tb, count)
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      var h1 = 0x9e3779b97f4a7c15L
      var h2 = 0xc2b2ae3d27d4eb4fL
      var j = 0
      while (j < k) {
        h1 = hashing.mix64(h1 ^ ta(i + j))
        h2 = hashing.mix64(h2 ^ tb(i + j))
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First-occurrence dedup on the (h1, h2) pair INSIDE the pass —
    * the doc-frequency consumers' shape. A downstream `array_distinct`
    * over array<struct> falls to the O(elements²) interpreted
    * comparison path; this is one hash-set walk.
    */
  private def computeDistinct(ta: Array[Long], tb: Array[Long],
      count: Int): ArrayData = {
    val k = this.k
    val seen = new java.util.HashSet[(Long, Long)](count * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](count)
    var i = 0
    while (i < count) {
      var h1 = 0x9e3779b97f4a7c15L
      var h2 = 0xc2b2ae3d27d4eb4fL
      var j = 0
      while (j < k) {
        h1 = hashing.mix64(h1 ^ ta(i + j))
        h2 = hashing.mix64(h2 ^ tb(i + j))
        j += 1
      }
      if (seen.add((h1, h2)))
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](h1, h2))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): TokenKgramHashes128 =
    copy(child = c)
}

/** Duplicate-k-gram character mass of a token array, in ONE per-row
  * pass: Σ over k-grams occurring ≥ 2× in the document of
  * (occurrences × gram char length), where a gram's char length is the
  * length of the space-joined k-token string (Σ token chars + k − 1) —
  * exactly the `cnt × length(gram)` mass [[graft.llm.TextAnalysis
  * .dupNgramCharFrac]] aggregated distributively. Repetition is WITHIN
  * a document, so the whole signal is a map over the scan: this
  * replaces a string-building gram explode plus two corpus-wide
  * aggregations (an exchange keyed on (doc, gram-string) and one on
  * doc) with zero shuffles. Gram identity is the [[TokenKgramHashes]]
  * 64-bit chain hash — the documented STATISTICS convention: an
  * intra-document birthday collision (~positions²/2⁶⁴) perturbs one
  * count; destructive consumers keep 128-bit keys.
  */
case class DupKgramChars(child: Expression, k: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(k >= 1)
  override def dataType: DataType = LongType
  override def prettyName: String = "dup_kgram_chars"

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val count = n - k + 1
    if (count <= 0) return 0L
    val th = new Array[Long](n)
    val tl = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = hashing.hashString(s, 42L)
      tl(i) = s.numChars()
      i += 1
    }
    // gram hash -> (occurrence count, gram char length) — glen stored
    // once per distinct gram (identical text ⇒ identical length)
    val cnt = new java.util.HashMap[Long, Array[Int]](count * 2)
    i = 0
    var glen = k - 1 // k−1 joining spaces
    var j = 0
    while (j < k) { glen += tl(j); j += 1 }
    while (i < count) {
      var h = 0x9e3779b97f4a7c15L
      j = 0
      while (j < k) { h = hashing.mix64(h ^ th(i + j)); j += 1 }
      val slot = cnt.get(h)
      if (slot == null) cnt.put(h, Array(1, glen))
      else slot(0) += 1
      // slide the window's char length: drop token i, admit token i+k
      if (i + k < n) glen += tl(i + k) - tl(i)
      i += 1
    }
    var dup = 0L
    val it = cnt.values().iterator()
    while (it.hasNext) {
      val s = it.next()
      if (s(0) >= 2) dup += s(0).toLong * s(1)
    }
    dup
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def computeCall(ref: String, c: String): String =
    s"$ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): DupKgramChars =
    copy(child = c)
}

/** Tokens NOT covered by any [s, e) span (1-based token positions),
  * original order preserved: the rebuild step of exact-substring removal.
  * Spans arrive as array<struct<s:bigint,e:bigint>> in ARBITRARY order
  * (they come from `collect_list`); the expression sorts them by start
  * once per row and then sweeps tokens and spans together with two
  * pointers — O(tokens + spans·log spans), replacing the
  * filter(transform(...), !exists(...)) HOF tree that was (a)
  * CodegenFallback (breaking whole-stage fusion for the entire rebuild
  * stage) and (b) O(tokens × spans) per document.
  */
case class RemoveCoveredTokens(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "remove_covered_tokens"

  def compute(toks: ArrayData, spans: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = spans.numElements()
    if (m == 0) {
      val all = new Array[Any](n)
      var i = 0
      while (i < n) { all(i) = toks.getUTF8String(i); i += 1 }
      return new GenericArrayData(all)
    }
    // sort span indices by start: pack (start << 20 | idx) into one long
    // so a primitive Arrays.sort suffices. Token positions are bounded by
    // Int (an ArrayData index), so start << 20 cannot collide across
    // distinct starts as long as m < 2^20; above that (a degenerate
    // million-span document) fall back to per-key stability not mattering
    // because equal starts sort adjacently either way.
    require(m < (1 << 20),
      s"remove_covered_tokens: $m spans in one document exceeds 2^20")
    val order = new Array[Long](m)
    var i = 0
    while (i < m) {
      order(i) = (spans.getStruct(i, 2).getLong(0) << 20) | i.toLong
      i += 1
    }
    java.util.Arrays.sort(order)
    val kept = new java.util.ArrayList[Any](n)
    var si = 0
    var maxEnd = Long.MinValue
    var p = 1L
    while (p <= n) {
      while (si < m && (order(si) >> 20) <= p) {
        val e = spans.getStruct((order(si) & 0xFFFFFL).toInt, 2).getLong(1)
        if (e > maxEnd) maxEnd = e
        si += 1
      }
      if (p >= maxEnd) kept.add(toks.getUTF8String((p - 1).toInt))
      p += 1
    }
    new GenericArrayData(kept.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($t, $s);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RemoveCoveredTokens =
    copy(left = l, right = r)
}

/** Column-level API over the native expressions. */
object native {
  private def e(c: Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)
  private def c(e: Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)

  def wordShingles(tokens: Column, n: Int): Column = c(WordShingles(e(tokens), n))
  def minhashSignature(shingles: Column, k: Int): Column = c(MinHashSignature(e(shingles), k))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def rollingHash64(tokens: Column): Column = c(RollingHash64(e(tokens)))
  def tokenKgramHashes(tokens: Column, k: Int,
      distinct: Boolean = false): Column =
    c(TokenKgramHashes(e(tokens), k, distinct))
  def tokenKgramHashes128(tokens: Column, k: Int,
      distinct: Boolean = false): Column =
    c(TokenKgramHashes128(e(tokens), k, distinct))
  def dupKgramChars(tokens: Column, k: Int): Column =
    c(DupKgramChars(e(tokens), k))
  def removeCoveredTokens(tokens: Column, spans: Column): Column =
    c(RemoveCoveredTokens(e(tokens), e(spans)))
  def deflateRatio(text: Column): Column = c(DeflateRatio(e(text)))
  def nfcNormalize(text: Column): Column = c(NfcNormalize(e(text)))
  def replaceMany(text: Column, pairs: Seq[(String, String)]): Column =
    c(ReplaceMany(e(text), pairs))
  def arrayDot(a: Column, b: Column): Column = c(ArrayDot(e(a), e(b)))
  def signSketches(vec: Column, nTables: Int, nBits: Int): Column =
    c(SignSketches(e(vec), nTables, nBits))
  def langId(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    c(LangId(e(tokens), profiles))
  def countInSet(tokens: Column, values: Seq[String]): Column =
    c(CountInSet(e(tokens), values))
  /** Call-boundary guard for [[inLongSet]]'s integral-only contract:
    * the long cast TRUNCATES a fractional column (5.9 matches 5), and
    * in the negated loser-filter form that silently drops extra rows —
    * strictly worse than a loud failure. Assert wherever a resolved
    * schema exists before building the InSet, so a future caller with
    * a double id fails fast instead of truncating.
    */
  def requireIntegralId(df: org.apache.spark.sql.DataFrame,
      colName: String, context: String): Unit = {
    import org.apache.spark.sql.types._
    // resolve the way Spark resolves column references — with the
    // session's resolver (case-insensitive by default) — not the
    // case-SENSITIVE StructType.apply: a caller writing "DOC_ID"
    // against a doc_id schema works everywhere else in the plan, so
    // the guard must judge the same column the plan will bind
    val resolver = df.sparkSession.sessionState.conf.resolver
    val field = df.schema.find(f => resolver(f.name, colName)).getOrElse(
      df.schema(colName)) // fall through to Spark's own error message
    val dt = field.dataType
    val ok = dt == ByteType || dt == ShortType ||
      dt == IntegerType || dt == LongType
    require(ok, s"$context: id column '$colName' must be integral for " +
      s"the InSet pushdown (a fractional id would truncate through the " +
      s"long cast), got ${dt.simpleString}")
  }
  /** Bounded-set membership as a single [[InSet]] node. `isin`/
    * `isInCollection` build an `In` with ONE LITERAL CHILD PER VALUE;
    * at the bounded-probe sizes the driver-local admission paths push
    * down (10³–10⁵ ids), the analyzer/optimizer walking that tree costs
    * 0.2–0.7 s of driver time PER QUERY — more than the probe's Spark
    * job itself. InSet is one node holding a hash set: O(1) analysis,
    * same null semantics as In (null input → null), and the optimizer
    * would have rewritten In to InSet past the conversion threshold
    * anyway. Membership-only — pair with [[inBoundedLongSet]] when the
    * column is a parquet-sortable id so footers can prune.
    */
  def inLongSet(col: Column, values: Iterable[Long]): Column = {
    val set: Set[Any] = values.iterator.map(v => Long.box(v): Any).toSet
    // InSet bypasses the analyzer coercion In would have received, and
    // its membership probe is boxed-equality: a non-Long input column
    // (Integer ids) would match NOTHING silently — and the negated
    // loser-filter form would silently keep every loser. The explicit
    // long cast makes INTEGRAL id columns (int/short/long) correct; on
    // an already-Long column Catalyst's SimplifyCasts elides it, so the
    // pushed-probe plan is unchanged at every current call site.
    // Contract: integral inputs only — a fractional column would
    // TRUNCATE through the cast (5.9 matches 5), which is worse than
    // the old match-nothing; no call site passes one.
    c(org.apache.spark.sql.catalyst.expressions.InSet(
      e(col.cast(org.apache.spark.sql.types.LongType)), set))
  }
  /** [[inLongSet]] plus a `min ≤ col ≤ max` range guard: the two range
    * literals reach the parquet scan (footer min/max pruning — the IN
    * list itself is past every pushdown threshold at these sizes), the
    * InSet does the exact membership. For monotone-id probes the range
    * alone skips every row group outside the delivery's id window.
    */
  def inBoundedLongSet(col: Column, values: Iterable[Long]): Column = {
    val it = values.iterator
    var mn = Long.MaxValue; var mx = Long.MinValue
    while (it.hasNext) { val v = it.next(); if (v < mn) mn = v; if (v > mx) mx = v }
    col.geq(mn) && col.leq(mx) && inLongSet(col, values)
  }
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    c(NearestCentroids(e(vec), centroids, nProbe))
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    c(PqEncode(e(vec), codebooks))
  def pqAdcDist(vec: Column, codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    c(PqAdcDist(e(vec), e(codes), codebooks))
}
