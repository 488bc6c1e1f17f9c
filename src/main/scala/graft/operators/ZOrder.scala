package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering keys for multi-dimensional data
  * layout — the standard file-skipping lever when scans filter on MORE
  * than one column (Delta's `OPTIMIZE ZORDER BY`, Iceberg's sort-order
  * z-curve: public technique, e.g. Morton 1966).
  *
  * A single-column sort gives perfect min/max pruning on that column
  * and none on any other; interleaving the bits of several range-binned
  * columns gives every file a bounded span in EVERY participating
  * dimension, so per-file column statistics prune multi-predicate scans
  * on all of them. At 100 TB this is a write-time layout decision:
  * compute the key once, `repartitionByRange` + sort on it, and let
  * ordinary parquet row-group stats do the pruning forever after.
  *
  * Everything here is closed-form integer arithmetic over driver-held
  * (min, max) bounds — one bounded aggregate to fetch them, then a pure
  * codegen'd projection; no UDF, no shuffle beyond the explicit
  * clustering repartition. The same formula is replayable in any SQL
  * engine (bit ops on BIGINT), so keys are engine-portable the way the
  * md5 split buckets are.
  */
object ZOrder {

  /** Exact 64-bit integer division (Spark's `/` on longs returns
    * DOUBLE, which silently loses exactness past 2^53 — epoch nanos
    * already exceed that). Catalyst's `IntegralDivide` is the `div`
    * SQL operator: codegen'd, type-preserving. */
  private def intDiv(a: Column, b: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b)))

  /** Map a long column with known inclusive bounds onto [0, 2^bits):
    * bin = (v - min) * 2^bits div (max - min + 1). Pure integer math —
    * deterministic in any engine — and monotone in `v`. Values outside
    * the bounds are clamped (late data after bounds were sampled).
    */
  def rangeBin(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 20, "1..20 bits per dimension")
    require(max >= min, s"empty range [$min,$max]")
    val span = max - min + 1
    require(span > 0 && min >= Long.MinValue / 2 && max <= Long.MaxValue / 2,
      "bounds too wide for overflow-free binning")
    val clamped = least(greatest(c.cast("long"), lit(min)), lit(max))
    // (v-min)·2^bits must stay under 2^63: multiply-then-divide while
    // span < 2^(62-bits); for wider spans pre-shrink by an integer
    // factor first (loses in-bin resolution only, never bin ordering)
    if (span <= (1L << (62 - bits)))
      intDiv((clamped - lit(min)) * lit(1L << bits), span)
    else {
      val shrink = (span + (1L << (62 - bits)) - 1) / (1L << (62 - bits))
      val shrunkSpan = (span + shrink - 1) / shrink
      intDiv(intDiv(clamped - lit(min), shrink) * lit(1L << bits), shrunkSpan)
    }
  }

  /** Interleave `bins` (each already in [0, 2^bits)) into one Morton
    * key: output bit (i·n + d) is bit i of dimension d, so the key's
    * high bits cycle through every dimension — contiguous key ranges
    * are hypercubes, bounded in EVERY dimension at once. Expression is
    * a fold of shift/mask terms: whole-stage-codegen'd, no UDF.
    */
  def interleave(bins: Seq[Column], bits: Int): Column = {
    val n = bins.length
    require(n >= 2, "z-ordering needs at least 2 dimensions")
    require(n * bits <= 62, s"$n dims x $bits bits exceeds a long key")
    // widen to long first: an IntegerType bin shifted past bit 31
    // would silently wrap
    val wide = bins.map(_.cast("long"))
    val terms = for (i <- 0 until bits; d <- 0 until n) yield
      shiftleft(shiftright(wide(d), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Add a Morton key over `cols` (long-castable) as `outCol`, binning
    * each column by its observed [min, max]. The bounds aggregate is the
    * only action — 2·|cols| driver-held longs, the same bounded-config
    * pattern as the IVF quantizer — and the key itself is one codegen'd
    * projection over the scan. Returns (keyed frame, per-column bounds)
    * so writers can persist the bounds and keep later deliveries on the
    * SAME grid (a key is only comparable under the grid that minted it).
    * A NULL in any participating dimension yields a NULL key (range
    * partitioning then groups such rows together — filter or impute
    * first if that is not the intended layout).
    */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 8,
      outCol: String = "zkey"): (DataFrame, Seq[(Long, Long)]) = {
    val bounds = trainBounds(df, cols)
    (withZKeyBounds(df, cols, bounds, bits, outCol), bounds)
  }

  /** The bounds aggregate of [[withZKey]] alone — grid state to persist
    * and reuse across deliveries/queries (train once, key forever: a
    * key is only comparable under the grid that minted it).
    */
  def trainBounds(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.anyNull, "cannot z-order an empty or all-null frame")
    cols.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
  }

  /** Key under a KNOWN grid — pure projection, zero actions. */
  def withZKeyBounds(df: DataFrame, cols: Seq[String],
      bounds: Seq[(Long, Long)], bits: Int = 8,
      outCol: String = "zkey"): DataFrame = {
    require(bounds.length == cols.length, "one (min,max) per column")
    df.withColumn(outCol, interleave(
      cols.zip(bounds).map { case (c, (lo, hi)) => rangeBin(col(c), lo, hi, bits) },
      bits))
  }

  /** Write-side clustering: key, then range-partition + sort so each
    * output task (→ file) covers one contiguous z-range — a hypercube
    * in the original dimensions, which is what makes every column's
    * min/max stats selective. `numFiles` sizes the layout; the range
    * exchange is the operator's one (intentional) shuffle.
    */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numFiles: Int = 64): DataFrame = {
    val (keyed, _) = withZKey(df, cols, bits)
    keyed.repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
  }
}
