package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: backward as-of join and
  * point-in-interval range join. Both are built by composing existing
  * operators (the preferred extension path) into shapes whose one shuffle
  * is keyed on high-cardinality columns — no sort-merge-inequality or
  * nested-loop fallback anywhere, so they hold at 100 TB.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the right row with
    * the same key and the greatest right time ≤ the left time (ties on
    * the time include the right row — "at or before").
    *
    * Plan shape: tag sides → union → ONE shuffle on the key → per-key
    * running `last(_, ignoreNulls)` window → filter left rows back out.
    * No join operator at all: both inputs shuffle once by key and the
    * window is a single sorted pass, so cost is O(shuffle(|L|+|R|)) —
    * the sort-merge-inequality join Spark would otherwise plan degrades
    * to per-key quadratic scans. This is the standard points/quotes
    * formulation (pandas merge_asof / DuckDB ASOF JOIN semantics).
    *
    * Contract: right rows should be unique per (key, time); with
    * duplicates the lexicographically greatest packed value wins
    * (deterministic, but define your own tiebreak upstream if it
    * matters). NULL keys group together (window semantics) — filter
    * them first for equi-join NULL behavior.
    *
    * @param rightValues right columns to attach (default: all but keys
    *                    and time)
    * @param matchedTimeAlias output column holding the matched right time
    * @param tolerance keep-match predicate over (leftTime, matchedTime),
    *                  e.g. `(lt, rt) => lt - rt <= lit(3600L)`; failing
    *                  matches become NULL (no-match)
    * @param forward false (default): latest right ≤ left (backward);
    *                true: earliest right ≥ left (forward) — the same
    *                union+window pass with the sort reversed
    * @param timeShard optional MONOTONE shard function over the time
    *                  column (e.g. `t => floor(t / 3600e9)` for hourly
    *                  buckets of an ns epoch). Without it, one window
    *                  partition per key — correct whenever key
    *                  cardinality scales with the data (users, stations).
    *                  WITH it, the pass goes two-level exactly like
    *                  [[graft.llm.Packing]]'s cumsum: within-(key, shard)
    *                  windows over bounded row ranges, plus a per-shard
    *                  last-match carry over the tiny (key × shard)
    *                  relation — for the few-keys/billions-of-rows shape
    *                  (per-instrument quotes) where a single per-key task
    *                  would otherwise sort the whole history.
    *                  Bit-identical output (JoinsSpec proves it).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightValues: Seq[String] = Nil,
      matchedTimeAlias: String = "matched_time",
      tolerance: Option[(Column, Column) => Column] = None,
      forward: Boolean = false,
      timeShard: Option[Column => Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val rv = if (rightValues.nonEmpty) rightValues
      else right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)
    val rPacked = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        struct(col(rightTime).as(matchedTimeAlias) +: rv.map(col): _*).as("_rv")): _*)
    val lPacked = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(rPacked.schema("_rv").dataType).as("_rv"),
        struct(left.columns.map(col): _*).as("_lv")): _*)
    val unioned = rPacked
      .withColumn("_lv", lit(null).cast(lPacked.schema("_lv").dataType))
      .unionByName(lPacked)
    // right rows sort before left rows at the same time (side 0 < 1), so
    // a right row AT the left time is visible — the ≤/≥ in the contract.
    // Forward mode reverses the time sort (the window machinery is
    // direction-agnostic); ties then prefer the SMALLEST packed value so
    // the match is the earliest-at-or-after.
    val timeOrd = if (forward) col("_t").desc else col("_t").asc
    val valOrd = if (forward) col("_rv").desc else col("_rv").asc
    val matched = timeShard match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(timeOrd, col("_side").asc, valOrd)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned
          .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
          .filter(col("_side") === 1)
      case Some(shardFn) =>
        // Two-level: the shard key is a function of _t, so shards
        // partition the global (_t, _side, _rv) order into contiguous
        // runs — the global running last-match is exactly
        // coalesce(within-shard match, last match of any earlier shard).
        val sharded = unioned.withColumn("_sh", shardFn(col("_t")))
        val wIn = Window.partitionBy((keys :+ "_sh").map(col): _*)
          .orderBy(timeOrd, col("_side").asc, valOrd)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inShard = sharded
          .withColumn("_m_in", last(col("_rv"), ignoreNulls = true).over(wIn))
        // per-(key, shard) final right match: under the backward order the
        // window's last = max(struct(_t, _rv)); forward = min — tiny
        // relation (#keys × #shards), extended to right-less shards so the
        // carry still reaches them
        val shardLastAgg =
          if (forward) min(struct(col("_t"), col("_rv")))
          else max(struct(col("_t"), col("_rv")))
        val shardLast = sharded.filter(col("_side") === 0)
          .groupBy((keys :+ "_sh").map(col): _*)
          .agg(shardLastAgg.getField("_rv").as("_sh_last"))
        val allShards = sharded.select((keys :+ "_sh").map(col): _*).distinct()
        val lastByShard = allShards.join(shardLast, (keys :+ "_sh").map(c =>
          allShards(c) <=> shardLast(c)).reduce(_ && _), "left")
          .select(allShards.columns.map(allShards(_)) :+ shardLast("_sh_last"): _*)
        val shardOrd = if (forward) col("_sh").desc else col("_sh").asc
        val wCarry = Window.partitionBy(keys.map(col): _*)
          .orderBy(shardOrd)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = lastByShard
          .withColumn("_carry", last(col("_sh_last"), ignoreNulls = true).over(wCarry))
          .select((keys.map(c => col(c).as(s"_ck_$c")) :+
            col("_sh").as("_ck_sh") :+ col("_carry")): _*)
        inShard.join(broadcast(carry),
            (keys.map(c => col(c) <=> col(s"_ck_$c")) :+
              (col("_sh") <=> col("_ck_sh"))).reduce(_ && _))
          .withColumn("_m", coalesce(col("_m_in"), col("_carry")))
          .filter(col("_side") === 1)
    }
    val kept = tolerance match {
      case Some(pred) => matched.withColumn("_m",
        when(col("_m").isNotNull &&
          pred(col("_t"), col("_m")(matchedTimeAlias)), col("_m")))
      case None => matched
    }
    kept.select(col("_lv.*") +:
      (matchedTimeAlias +: rv).map(f => col("_m")(f).as(f)): _*)
  }

  /** Exact floor division that stays integral end-to-end: long / long
    * through doubles loses exactness above 2^53 (nanosecond epochs are
    * ~2^60), so divide in decimal(38,0) and floor there.
    */
  private def floorDiv(c: Column, divisor: Long): Column =
    floor(c.cast("decimal(38,0)") / lit(divisor)).cast("long")

  /** Point-in-interval range join: rows of `points` matched to rows of
    * `intervals` with `start ≤ point < end` (half-open), plus optional
    * equi-keys. Intervals with `end ≤ start` are empty and dropped.
    *
    * Plan shape: each interval is exploded to the fixed-width buckets it
    * overlaps (fan-out = interval span / bucketWidth, a small constant
    * when bucketWidth ≈ typical span), each point computes its single
    * bucket, and the equi-join on (keys, bucket) + exact containment
    * filter does the rest. A (point, interval) pair can meet in at most
    * one bucket — the point's own — so no dedup pass is needed. This is
    * interval blocking: the inequality join becomes an equi-join whose
    * key cardinality scales with the time domain, instead of a
    * broadcast-nested-loop that goes quadratic.
    *
    * @param bucketWidth bucket size in the units of the point column;
    *                    choose ≈ the typical interval span
    */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floorDiv(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket", explode(sequence(
        floorDiv(col(startCol), bucketWidth),
        floorDiv(col(endCol) - 1, bucketWidth))))
    p.join(iv, keys :+ "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
