package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.Packing

/** Sequence packing: budget boundaries, per-group independence,
  * two-level (shard + prefix-offset) equivalence to the single-window
  * formulation, and the plan-shape guarantee that no row-level window
  * partition spans a whole source.
  */
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

  test("two-level packing is bit-identical to a single whole-source window") {
    // 1000 docs over 3 sources, shardWidth=64 forces ~16 shards so the
    // cross-shard offset path is genuinely exercised; token counts vary
    // deterministically and include budget-sized and tiny docs
    val rows = (0L until 1000L).map { id =>
      (id, s"s${id % 3}", 1L + (id * 37 % 130))
    }
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val got = Packing.packSequences(df, budgetTokens = 100L, shardWidth = 64L)
      .select("doc_id", "cum_tokens", "seq_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference semantics: one window over the whole source
    val w = Window.partitionBy("source").orderBy("doc_id")
    val want = df.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr("(cum_tokens - n_tokens) div 100L"))
      .select("doc_id", "cum_tokens", "seq_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("NULL source and NULL doc_id rows survive the offset join") {
    // the two-level offset re-attach must be null-safe: a plain equi-join
    // on (source, shard) would silently drop the NULL groups
    val df = Seq(
      (Some(0L), Option("a"), 60L), (Some(1L), Option("a"), 50L),
      (Some(2L), Option.empty[String], 110L), (Some(3L), Option.empty[String], 40L),
      (Option.empty[Long], Option("a"), 10L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Packing.packSequences(df, budgetTokens = 100L)
    assert(out.count() == 5, "no rows may be dropped")
    val nullSrc = out.filter(col("source").isNull)
      .select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NULL source packs as its own group: doc starts 0, 110 -> seqs 0, 1
    assert(nullSrc(2L) == 0L && nullSrc(3L) == 1L)
  }

  test("caller-supplied monotone shard expression matches the default path") {
    val df = (0L until 300L).map(id => (id, "one", 7L))
      .toDF("doc_id", "source", "n_tokens")
    val a = Packing.packSequences(df, 50L, shardWidth = 32L)
    val b = Packing.packSequences(df, 50L, shardExpr = Some("doc_id div 32L"))
    assert(a.select("doc_id", "seq_id").collect().toSet ==
      b.select("doc_id", "seq_id").collect().toSet)
  }

  test("max-of-cumsum shard totals equal the plain per-shard sums under " +
      "NULL and zero token counts") {
    // the r19 exchange merge reads each shard's token total off
    // max(_cum_in) instead of re-aggregating the raw rows with
    // sum(n_tokens) — the substitution is exact iff the cumsum is
    // non-decreasing (counts ≥ 0) with nulls skipped by both sides,
    // including groups that START with nulls and all-null groups (both
    // total NULL either way). Pin the substituted quantity directly.
    val rows: Seq[(Long, String, Option[Long])] =
      (0L until 200L).map { id =>
        val nt = if (id % 7 == 3) Option.empty[Long]
          else if (id % 11 == 5) Some(0L)
          else Some(1L + (id * 31 % 90))
        (id, s"s${id % 3}", nt)
      } ++ Seq((900L, "allnull", Option.empty[Long]),
        (901L, "allnull", Option.empty[Long]))
    val df = rows.toDF("doc_id", "source", "n_tokens")
      .withColumn("_shard", expr("doc_id div 16L"))
    val wIn = Window.partitionBy("source", "_shard").orderBy("doc_id")
    def totals(agged: org.apache.spark.sql.DataFrame) = agged.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    val viaMax = totals(df
      .withColumn("_cum_in", sum(col("n_tokens")).over(wIn))
      .groupBy("source", "_shard").agg(max(col("_cum_in"))))
    val viaSum = totals(df
      .groupBy("source", "_shard").agg(sum(col("n_tokens"))))
    assert(viaMax == viaSum)
    // and end-to-end output on the same null-bearing corpus is stable
    // against the pre-r19 shape: offset + cumsum assembled identically
    val wSh = Window.partitionBy("source").orderBy("_shard")
    val inShard = df.withColumn("_cum_in", sum(col("n_tokens")).over(wIn))
    val oldOffsets = df.groupBy(col("source"), col("_shard"))
      .agg(sum(col("n_tokens")).as("_shard_tokens"))
      .withColumn("_offset",
        sum(col("_shard_tokens")).over(wSh) - col("_shard_tokens"))
      .select(col("source").as("_by_off"), col("_shard").as("_shard_off"),
        col("_offset"))
    val want = inShard.join(broadcast(oldOffsets),
        col("source") <=> col("_by_off") && col("_shard") <=> col("_shard_off"))
      .withColumn("cum_tokens", col("_offset") + col("_cum_in"))
      .withColumn("seq_id", expr("(cum_tokens - n_tokens) div 100L"))
      .select("doc_id", "cum_tokens", "seq_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val got = Packing.packSequences(
        df.drop("_shard"), budgetTokens = 100L, shardWidth = 16L)
      .select("doc_id", "cum_tokens", "seq_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == want)
  }

  test("offsets aggregate consumes the row-level window (shared exchange, " +
      "not a pruned second pass)") {
    // the shard-totals aggregate must sit ON TOP of the row-level cumsum
    // window in the optimized plan — if column pruning drops _cum_in the
    // window vanishes from that branch and the corpus-sized upstream is
    // re-derived and re-exchanged a second time (guide §2.4)
    val df = (0L until 100L).map(id => (id, s"s${id % 2}", 5L))
      .toDF("doc_id", "source", "n_tokens")
    val plan = Packing.packSequences(df, 100L, shardWidth = 16L)
      .queryExecution.optimizedPlan
    val aggsOverWindow = plan.collect {
      case a: Aggregate if a.collectFirst { case w: LWindow => w }.isDefined => a
    }
    assert(aggsOverWindow.nonEmpty,
      "shard-totals aggregate no longer rides the cumsum window's exchange")
  }

  test("no row-level window partition spans a full source") {
    val df = (0L until 100L).map(id => (id, s"s${id % 2}", 5L))
      .toDF("doc_id", "source", "n_tokens")
    val plan = Packing.packSequences(df, 100L, shardWidth = 16L)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      // the row-level cumsum must partition on (source, shard); a window
      // keyed on source alone is only legal over the tiny per-shard
      // totals relation (child contains an Aggregate)
      val overAggregate = w.child.collectFirst { case a: Aggregate => a }.isDefined
      assert(w.partitionSpec.size >= 2 || overAggregate,
        s"single-key window over raw rows: ${w.partitionSpec}")
    }
  }
}
