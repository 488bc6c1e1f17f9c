package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.Cross

/** Plan-hygiene regression gate: every declared query's optimized plan is
  * audited for the shapes that do not survive scale — an unpartitioned
  * Window (single-partition sort of the world) and a cross join that
  * isn't an intentional bounded/broadcast design. Catches a regression
  * at plan level without executing anything.
  */
class PlanAuditSpec extends SparkSpec {

  // intentional nested-loop designs: a9 ranks k=20 TakeOrdered rows via
  // an inequality self-join; brute-force cosine broadcasts the query set
  // against the corpus by design (it IS the exhaustive baseline)
  private val allowedCross = Set("a9_vocab_topk", "x_cosine_topk")

  test("no gate query plans an unpartitioned window or stray cross join") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val globalWindows = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => "global-window"
      }
      // a window keyed ONLY on known low-cardinality columns funnels a
      // whole source/language into one task — the packSequences shape the
      // round-2 audit missed. Legal only over an already-aggregated
      // (tiny) child, e.g. per-shard totals or per-group stats.
      val lowCard = Set("source", "lang", "split", "r_name", "n_name")
      // the exemption requires the Aggregate ON THE SPINE between the
      // window and its input (walking only unary nodes) — an aggregate
      // hiding on the far side of a join must NOT exempt a window over
      // raw rows
      def spineAggregated(p: LogicalPlan): Boolean = p match {
        case _: Aggregate => true
        case u if u.children.size == 1 => spineAggregated(u.children.head)
        case _ => false
      }
      val lowCardWindows = plan.collect {
        case w: LWindow
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(_.references.forall(a => lowCard(a.name))) &&
              !spineAggregated(w.child) =>
          s"low-cardinality-window(${w.partitionSpec.map(_.sql).mkString(",")})"
      }
      // a condition-less join whose build side is provably ≤1 row is a
      // scalar broadcast attach (e.g. a corpus-total aggregate), not a
      // quadratic blowup — Catalyst's maxRows proves it statically
      def scalarSide(j: Join): Boolean =
        j.left.maxRows.exists(_ <= 1) || j.right.maxRows.exists(_ <= 1)
      val crosses = plan.collect {
        case j: Join
            if (j.joinType == Cross || j.condition.isEmpty) &&
              !scalarSide(j) => "cross-join"
      }.filterNot(_ => allowedCross(name))
      (globalWindows ++ lowCardWindows ++ crosses).map(kind => s"$name: $kind")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("filters and projections reach the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    def scans(name: String) =
      SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    // predicate pushdown: q6's range predicates hit the lineitem scan
    assert(scans("tpch_q6_revenue_delta").exists(
      _.metadata("PushedFilters").contains("GreaterThanOrEqual")),
      "q6 range filters not pushed")
    // the decontamination corpus/benchmark id splits push to both scans
    assert(scans("x_decontaminate").exists(
      _.metadata("PushedFilters").contains("GreaterThanOrEqual(doc_id,10)")),
      "decontaminate corpus-side filter not pushed")
    // column pruning: the quality scorer touches 2 of documents' 5 columns
    val qs = scans("x_quality_score")
    assert(qs.nonEmpty &&
      qs.forall(_.requiredSchema.fieldNames.toSet == Set("doc_id", "text")),
      s"expected (doc_id, text) scan, got ${qs.map(_.requiredSchema.fieldNames.mkString(","))}")
    // and the embedding stats never read the label column
    val es = scans("x_embed_stats")
    assert(es.nonEmpty &&
      es.forall(!_.requiredSchema.fieldNames.contains("label")),
      "x_embed_stats reads the unused label column")
  }

  // The TPC-H subquery gates exist to exercise Catalyst's subquery
  // rewrites; the wrong-plan failure mode is a correlated subquery that
  // SURVIVES optimization and re-executes per outer row — O(parts)
  // separate scans for Q2's min-cost lookup, O(pairs) for Q20's
  // shipped-volume aggregate. The audit pins the rewrite: after
  // optimization no correlated scalar / IN / EXISTS subquery
  // expression may remain (uncorrelated scalars — Q11's one-row
  // threshold — are fine: they run once and broadcast).
  test("TPC-H subquery gates decorrelate to joins, not per-row re-execution") {
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, ScalarSubquery}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val dir = "/root/testdata/sf0.001"
    def optimized(name: String) =
      SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
    for (name <- Seq("tpch_q2_min_cost_supp", "tpch_q11_important_stock",
        "tpch_q16_supplier_cnt", "tpch_q20_excess_stock")) {
      val leftovers = optimized(name).collectWithSubqueries {
        case p => p.expressions.flatMap(_.collect {
          case s: ScalarSubquery if s.outerAttrs.nonEmpty =>
            "correlated-scalar-subquery"
          case _: InSubquery => "in-subquery"
          case _: Exists => "exists"
        })
      }.flatten
      assert(leftovers.isEmpty,
        s"$name: unrewritten subqueries survive optimization: $leftovers")
    }
    // Q20's nested IN chain must stack into semi joins (supplier ⋉ ps,
    // ps ⋉ part) with the correlated SUM decorrelated into a join
    val q20 = optimized("tpch_q20_excess_stock")
    val q20Semis = q20.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(q20Semis.size >= 2,
      s"q20: expected the nested semi-join chain, got ${q20Semis.size} semi joins")
    // Q2's per-part min must appear as an aggregate on the join side —
    // the decorrelated form (at least the ps GROUP BY + the min rollup)
    val q2Aggs = optimized("tpch_q2_min_cost_supp")
      .collect { case a: Aggregate => a }
    assert(q2Aggs.size >= 2,
      s"q2: expected the decorrelated min-cost aggregate, got ${q2Aggs.size}")
    // Q2 references the ps CTE twice (outer + decorrelated subquery);
    // Catalyst inlines both, so the STATIC plan carries two
    // scan→aggregate subtrees — the 100 TB failure mode would be two
    // full fact scans. AQE's stage reuse must collapse them: after
    // execution, the adaptive plan carries the subquery side's ps
    // shuffle as a ReusedExchange/ReusedQueryStage of the outer one,
    // i.e. the fact map stage ran ONCE.
    val q2df = SparkEntry.queries("tpch_q2_min_cost_supp")(spark, dir)
    q2df.collect()
    val executed = q2df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") ||
        executed.contains("ReusedQueryStage"),
      "q2: the twice-referenced ps aggregate no longer reuses its " +
        "shuffle stage — the fact table would be scanned twice at scale")
  }
}
