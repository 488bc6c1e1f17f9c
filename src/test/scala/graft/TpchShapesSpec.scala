package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.queries.RelationalQueries
import graft.sources.Tables

/** Semantics + plan-shape pins for the round-12 TPC-H additions
  * (Q8/Q12/Q17/Q18/Q22, adapted to the synthetic schema). Each gate's
  * values are recomputed here by an INDEPENDENT formulation (different
  * plan, same answer) so a regression in the gate's clever shape can't
  * hide behind its own oracle; the scale claims (having-first, per-part
  * avg broadcast, anti-join on the pre-filtered slice) are pinned on
  * the physical plan where they are load-bearing.
  */
class TpchShapesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def gate(name: String) = RelationalQueries.queries(name)(spark, dir)

  test("q18: every surviving order really exceeds the quantity cut") {
    val rows = gate("tpch_q18_large_orders").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 220))
    // independent recomputation: filter AFTER a plain join, not having-first
    val li = Tables.table(spark, dir, "lineitem")
    val naive = li.join(Tables.table(spark, dir, "orders"),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      .filter(col("q") > 220).count()
    assert(rows.length.toLong == naive)
  }

  test("q18 plan: the having-aggregate feeds the join, not vice versa") {
    // the first shuffle below the orders join must be the lineitem
    // groupBy — i.e. the aggregate exists in the plan at all (a naive
    // join-then-filter shape would aggregate AFTER the join and carry
    // every line through it). Pin: some HashAggregate has a direct
    // lineitem scan under its exchange.
    val plan = gate("tpch_q18_large_orders").queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    // survivor-filter aggregate is join-free underneath
    assert(aggs.exists(_.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty), "having-aggregate rides above the join")
  }

  test("q17: cut uses the per-part average over the brand slice only") {
    val out = gate("tpch_q17_small_qty_revenue").collect()
    assert(out.length == 1)
    // independent recomputation with a window instead of the agg join
    val p = Tables.table(spark, dir, "part")
      .filter(col("p_brand") === "Brand#1" && col("p_size") <= 5)
      .select("p_partkey")
    val li = Tables.table(spark, dir, "lineitem")
      .join(p, col("l_partkey") === p("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val expect = li.withColumn("_a", avg("l_quantity").over(w))
      .filter(col("l_quantity") < col("_a") * 0.2)
      .agg((sum("l_extendedprice") / 7.0).as("v")).collect()(0).getDouble(0)
    val got = out(0).getAs[Double]("avg_yearly")
    assert(math.abs(got - expect) < 0.01, s"$got vs $expect")
  }

  test("q22: survivors have no urgent order and sit above the threshold") {
    val out = gate("tpch_q22_idle_balance")
    val total = out.agg(sum("numcust")).collect()(0).getLong(0)
    assert(total > 0)
    // no survivor nation outside the five named codes
    val codes = out.select("cntrycode").collect().map(_.getLong(0)).toSet
    assert(codes.subsetOf(Set(1L, 3L, 5L, 7L, 9L)))
    // independent recomputation via left join + null check
    val c = Tables.table(spark, dir, "customer")
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
    val thr = c.filter(col("c_acctbal") > 0)
      .agg(avg(round(col("c_acctbal") * 100))).collect()(0).getDouble(0)
    val urgent = Tables.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("_uck")).distinct()
    val expect = c.filter(round(col("c_acctbal") * 100) > thr)
      .join(urgent, col("c_custkey") === col("_uck"), "left")
      .filter(col("_uck").isNull).count()
    assert(total == expect)
  }

  test("q12: high/low split sums to the returned-1997 line count") {
    val rows = gate("tpch_q12_priority_lines").collect()
    assert(rows.map(_.getAs[String]("l_linestatus")).toSet == Set("O", "F"))
    val total = rows.map(r =>
      r.getAs[Long]("high_count") + r.getAs[Long]("low_count")).sum
    val expect = Tables.table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp")).count()
    assert(total == expect)
  }

  test("q8: market share is a true share and years are the window") {
    val rows = gate("tpch_q8_market_share").collect()
    assert(rows.map(_.getAs[Long]("o_year")).toSet == Set(1996L, 1997L))
    assert(rows.forall { r =>
      val s = r.getAs[Double]("mkt_share"); s >= 0.0 && s <= 1.0
    })
  }

  test("q4: semi join counts each order once regardless of line fan-out") {
    val rows = gate("tpch_q4_order_priority").collect()
    assert(rows.map(_.getAs[String]("o_orderpriority")).toSet.size == rows.length)
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // independent recomputation: inner join + distinct (the fan-out
    // shape the semi join must be equivalent to after dedup)
    val o = Tables.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val expect = o.join(
        Tables.table(spark, dir, "lineitem")
          .filter(col("l_returnflag") === "R").select("l_orderkey"),
        o("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey").distinct().count()
    assert(total == expect, s"$total vs $expect")
  }

  test("q12 plan: returnflag + shipdate predicates reach the lineitem scan") {
    val scans = gate("tpch_q12_priority_lines").queryExecution.sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    val li = scans.filter(_.metadata("Location").contains("lineitem"))
    assert(li.nonEmpty && li.forall { s =>
      val pf = s.metadata("PushedFilters")
      pf.contains("EqualTo(l_returnflag,R)") && pf.contains("GreaterThanOrEqual")
    }, s"pushed: ${li.map(_.metadata("PushedFilters"))}")
  }

  test("q22 plan: anti join against the pre-filtered urgent slice") {
    val plan = gate("tpch_q22_idle_balance").queryExecution.optimizedPlan
    val antis = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty, "q22 lost its anti join")
    // the urgent-priority filter sits UNDER the anti join (probe side is
    // the slice, not all orders)
    assert(antis.exists(_.right.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("1-URGENT") => f
    }.nonEmpty), "urgent filter not under the anti join")
  }

  test("q8/q17 plans: dims broadcast; only fact-sized joins shuffle") {
    // q17's per-part avg must come back as a BROADCAST (the slice is
    // part-bounded), leaving at most the one aggregation exchange pair
    def shuffles(name: String) =
      gate(name).queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }.length
    assert(shuffles("tpch_q17_small_qty_revenue") <= 2,
      "q17 per-part avg stopped broadcasting")
    // q8: lineitem⋈orders is the only fact shuffle; dims broadcast.
    // orders also arrives via one exchange + the final year agg —
    // anything beyond 4 means a dim fell out of broadcast.
    assert(shuffles("tpch_q8_market_share") <= 4,
      "q8 dim join fell back to shuffle")
  }
}
