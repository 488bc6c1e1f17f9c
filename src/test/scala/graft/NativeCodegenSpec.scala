package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.functions._

import graft.expr.native

/** Codegen contract for the native expressions (`graft.expr`).
  *
  * Two properties per expression:
  *  1. the generated-code path produces bit-identical results to the
  *     interpreted `nullSafeEval` path (forced via
  *     `spark.sql.codegen.factoryMode=NO_CODEGEN` + wholeStage off);
  *  2. every physical node evaluating one of them sits INSIDE a
  *     WholeStageCodegen region — the point of implementing `doGenCode`:
  *     a CodegenFallback expression makes CollapseCodegenStages reject
  *     the WHOLE stage, dropping every sibling expression to interpreted
  *     eval in the dedup/ANN inner loops.
  */
class NativeCodegenSpec extends SparkSpec {
  import spark.implicits._

  private val centroids =
    Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 1.0))

  private val profiles = Seq(
    "en" -> Seq("the", "over", "lazy"), "fr" -> Seq("le", "est", "sur"))

  /** All eleven expressions in one projection over one narrow scan. */
  private def allExprs(): DataFrame = {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", Array(1.0, 0.0, 2.0, -1.0)),
      (1L, "the quick brown fox jumps over the lazy dog", Array(0.5, 0.25, -0.75, 1.5)),
      (2L, "a b", Array(0.0, 0.0, 0.0, 0.0)),
      (3L, "x", Array(3.0, -2.0, 0.5, 0.125)),
      (4L, "le chat est sur le tapis et le chien dort", Array(-1.0, 4.0, 0.25, 2.0)),
      (5L, "", Array(0.25, 0.25, 0.25, 0.25))
    ).toDF("id", "text", "vec").repartition(2)
    val toks = split(col("text"), " ")
    base.select(
      col("id"),
      native.wordShingles(toks, 3).as("sh"),
      native.minhashSignature(native.wordShingles(toks, 3), 16).as("mh"),
      native.simhash64(toks).as("sim"),
      native.rollingHash64(toks).as("rh"),
      native.langId(toks, profiles).as("lang"),
      native.countInSet(toks, Seq("the", "le", "a")).as("cnt"),
      native.arrayDot(col("vec"), col("vec")).as("dot"),
      native.signSketches(col("vec"), 4, 12).as("sk"),
      native.nearestCentroids(col("vec"), centroids, 2).as("nc"),
      native.deflateRatio(col("text")).as("dr"),
      native.nfcNormalize(concat(col("text"),
        lit(" Cafe\u0301 A\u030A"))).as("nfc"),
      native.replaceMany(concat(col("text"),
          lit(" th\u00C3\u00A9 \u00E2\u20AC\u0153quote\u00E2\u20AC\u00A6 \u00C3\u00A9 \u00C3x \u00E2\u20AC")),
        graft.llm.TextAnalysis.MojibakeMap).as("rm"),
      native.tokenKgramHashes(toks, 3).as("kg"),
      native.tokenKgramHashes128(toks, 3).as("kg2"),
      native.removeCoveredTokens(toks,
        array(struct(lit(2L).as("s"), lit(4L).as("e")))).as("rct"))
  }

  test("generated code matches interpreted eval bit-for-bit") {
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList; case x => x
    }).sortBy(_.head.toString).toSeq
    val compiled = rows(allExprs())
    val ws0 = spark.conf.get("spark.sql.codegen.wholeStage")
    val fm0 = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(compiled == rows(allExprs()))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws0)
      fm0.foreach(spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  /** Flatten the physical tree with per-node "inside a fused codegen
    * region" flags. Crosses AQE roots, cached-relation boundaries, and
    * honors WholeStageCodegen entry / InputAdapter exit.
    */
  private def flatten(p: SparkPlan, fused: Boolean): Seq[(SparkPlan, Boolean)] = {
    val childFused = p match {
      case _: WholeStageCodegenExec => true
      case _: InputAdapter => false
      case _ => fused
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case im: InMemoryTableScanExec => im.children :+ im.relation.cachedPlan
      case _ => p.children
    }
    (p, fused) +: kids.flatMap(flatten(_, childFused))
  }

  private def assertNativeNodesFused(label: String, df: DataFrame): Unit = {
    // AQE only inserts WholeStageCodegen per stage AT MATERIALIZATION;
    // execute first, then inspect the final adaptive plan
    df.collect()
    val plan = df.queryExecution.executedPlan
    def hostsNative(p: SparkPlan): Boolean = p match {
      // leaf scans only LIST pushed filters as metadata (DataFilters);
      // rows are filtered by the Filter node above, which must be fused
      case _: org.apache.spark.sql.execution.LeafExecNode => false
      case _ =>
        p.expressions.exists(_.exists(_.getClass.getName.startsWith("graft.expr.")))
    }
    val nodes = flatten(plan, fused = false).filter(t => hostsNative(t._1))
    assert(nodes.nonEmpty, s"$label: no native-expression node found in plan")
    val unfused = nodes.filterNot(_._2)
    assert(unfused.isEmpty,
      s"$label: ${unfused.size} of ${nodes.size} native-expression node(s) " +
        s"outside whole-stage codegen:\n${unfused.map(_._1.nodeName).mkString(", ")}\n$plan")
  }

  test("native-expression projections stay inside WholeStageCodegen") {
    // repartition blocks ConvertToLocalRelation from constant-folding the
    // projection away at optimization time
    assertNativeNodesFused("allExprs", allExprs())
  }

  test("dedup/ANN gate stages contain no codegen fallback break") {
    // the real hot paths: minhash candidates + brute-force cosine over
    // testdata — the stages carrying native expressions must be fused
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("x_minhash_candidates", "x_cosine_topk", "x_simhash")) {
      assertNativeNodesFused(q, SparkEntry.queries(q)(spark, dir))
    }
  }

  test("tokenKgramHashes128: lanes independent, window identity, count") {
    val df = Seq((0L, "a b c d e"), (1L, "z z a b c d q"), (2L, "a b"))
      .toDF("id", "text")
      .select(col("id"),
        native.tokenKgramHashes128(split(col("text"), " "), 3).as("kg"))
    val kg = df.collect().map(r => r.getAs[Long]("id") ->
      r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getLong(1))).toList).toMap
    assert(kg(0L).size == 3 && kg(1L).size == 5) // n - k + 1
    assert(kg(2L).isEmpty) // shorter than k
    assert(kg(0L)(0) == kg(1L)(2)) // same window "a b c" → same 128-bit key
    assert(kg(0L).forall(p => p._1 != p._2)) // lanes differ (independent seeds)
    assert(kg(0L).map(_._1).distinct.size == 3) // distinct windows per lane
    assert(kg(0L).map(_._2).distinct.size == 3)
  }

  test("removeCoveredTokens: unsorted/overlapping spans, bounds, empties") {
    val toks = split(lit("t1 t2 t3 t4 t5 t6 t7 t8"), " ")
    def run(spans: Column): List[String] =
      Seq(1).toDF("one").select(
        native.removeCoveredTokens(toks, spans).as("kept"))
        .head().getSeq[String](0).toList
    // spans arrive unsorted and overlapping: [5,7) ∪ [2,4) ∪ [3,6) covers
    // positions 2..6 → keep 1, 7, 8 ([s,e) half-open, 1-based)
    assert(run(array(
      struct(lit(5L).as("s"), lit(7L).as("e")),
      struct(lit(2L).as("s"), lit(4L).as("e")),
      struct(lit(3L).as("s"), lit(6L).as("e")))) == List("t1", "t7", "t8"))
    // empty span set → everything kept
    assert(run(array().cast("array<struct<s:long,e:long>>")) ==
      List("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8"))
    // full coverage → nothing kept
    assert(run(array(struct(lit(1L).as("s"), lit(9L).as("e")))) == Nil)
    // disjoint islands: [1,3) and [6,8) → keep 3,4,5,8
    assert(run(array(
      struct(lit(6L).as("s"), lit(8L).as("e")),
      struct(lit(1L).as("s"), lit(3L).as("e")))) ==
      List("t3", "t4", "t5", "t8"))
  }

  test("tokenKgramHashes: window identity, order sensitivity, count") {
    val df = Seq(
      (0L, "a b c d e"), (1L, "z z a b c d q"), (2L, "b a c d e"),
      (3L, "a b"))
      .toDF("id", "text")
      .select(col("id"),
        native.tokenKgramHashes(split(col("text"), " "), 3).as("kg"))
    val kg = df.collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1).toList).toMap
    assert(kg(0L).size == 3 && kg(1L).size == 5) // n - k + 1
    assert(kg(3L).isEmpty) // shorter than k
    assert(kg(0L)(0) == kg(1L)(2)) // same window "a b c" → same hash
    assert(kg(0L)(1) == kg(1L)(3)) // "b c d"
    assert(kg(0L)(0) != kg(2L)(0)) // "a b c" vs "b a c": order-sensitive
    assert(kg(0L).distinct.size == 3) // distinct windows → distinct hashes
  }

  test("tokenKgramHashes distinct mode == array_distinct of positioned mode") {
    val docs = Seq((0L, "a b c a b c a b"), (1L, "p q r s"),
      (2L, "x x x x x x")).toDF("id", "text")
    val t = split(col("text"), " ")
    val rows = docs.select(col("id"),
      native.tokenKgramHashes(t, 3, distinct = true).as("d"),
      array_distinct(native.tokenKgramHashes(t, 3)).as("ref"),
      native.tokenKgramHashes128(t, 3, distinct = true).as("d128"),
      array_distinct(native.tokenKgramHashes128(t, 3)).as("ref128"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"64-bit doc ${r.getLong(0)}")
      assert(r.getSeq[org.apache.spark.sql.Row](3) ==
        r.getSeq[org.apache.spark.sql.Row](4), s"128-bit doc ${r.getLong(0)}")
    }
  }

  test("dupKgramChars equals the string-gram groupBy formulation") {
    // reference: explode string k-grams, count per (doc, gram), sum
    // cnt·len(gram) where cnt ≥ 2 — the shape dupNgramCharFrac used
    // before the native one-pass expression replaced it
    val docs = Seq(
      (0L, "spam ham jam spam ham jam spam ham jam"), // heavy repeats
      (1L, "all distinct words here today"), // zero duplicate grams
      (2L, "a b a b a b a b"), // overlapping repeats
      (3L, "x y"), // shorter than k → filtered upstream; expr → 0
      (4L, "aa  bb aa  bb aa")) // empty tokens from double spaces
      .toDF("doc_id", "text")
    val k = 3
    val ref = docs
      .withColumn("_toks", split(col("text"), " "))
      .filter(size(col("_toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(_toks) - ${k - 1}), " +
          s"i -> array_join(slice(_toks, i, $k), ' '))")).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"), first(length(col("gram"))).as("glen"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("cnt") >= 2, col("cnt") * col("glen"))
        .otherwise(0L)).as("dup"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = docs
      .select(col("doc_id"),
        native.dupKgramChars(split(col("text"), " "), k).as("dup"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ref.foreach { case (id, dup) => assert(got(id) == dup, s"doc $id") }
    assert(got(3L) == 0L) // below k tokens: no gram exists
  }

  test("inLongSet/inBoundedLongSet match isin semantics, including nulls") {
    val vals = Seq(2L, 5L, 900L)
    val df = Seq[java.lang.Long](1L, 2L, 5L, 7L, 900L, 901L, null)
      .toDF("id")
    def ids(c: Column): Set[Option[Long]] = df.filter(c).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    val viaIsin = ids(col("id").isin(vals.map(Long.box): _*))
    assert(ids(native.inLongSet(col("id"), vals)) == viaIsin)
    assert(ids(native.inBoundedLongSet(col("id"), vals)) == viaIsin)
    // negated (the loser-filter form): null id drops on BOTH paths
    val viaNotIsin = ids(!col("id").isin(vals.map(Long.box): _*))
    assert(ids(!native.inLongSet(col("id"), vals)) == viaNotIsin)
    assert(!viaNotIsin.contains(None))
    // the range guard is conjunction-only: values outside [min,max]
    // are excluded by the guard and by the set identically
    assert(ids(native.inBoundedLongSet(col("id"), Seq(5L))) == Set(Some(5L)))
  }

  test("requireIntegralId resolves the id column the way Spark does " +
      "(case-insensitive by default)") {
    val df = Seq((1L, 0.5)).toDF("doc_id", "score")
    // a caller writing DOC_ID binds fine everywhere else in the plan
    // (session resolver is case-insensitive), so the guard must accept
    // it too rather than throw on the case-sensitive schema lookup
    native.requireIntegralId(df, "DOC_ID", "spec")
    native.requireIntegralId(df, "doc_id", "spec")
    // a genuinely fractional id still fails fast, under either casing
    intercept[IllegalArgumentException] {
      native.requireIntegralId(df, "SCORE", "spec")
    }
    intercept[IllegalArgumentException] {
      native.requireIntegralId(df, "score", "spec")
    }
  }
}
