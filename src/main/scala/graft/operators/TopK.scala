package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Scalable per-group top-k.
  *
  * The naive shape — `row_number() OVER (PARTITION BY key ORDER BY v)`
  * then `rank <= k` — funnels every row of a group through one task; for
  * low-cardinality keys (a handful of sources/languages over billions of
  * rows) that is the single-reducer bottleneck PlanAuditSpec rejects.
  *
  * This operator aggregates with a partial buffer that is HARD-CAPPED at
  * k rows: `ColumnBridge.collectTopK` wraps Spark's bounded top-k
  * aggregate, whose aggregation state is a k-element
  * `BoundedPriorityQueue`. Map-side partials therefore hold at most k
  * rows per (task, key) regardless of input size, the exchange carries
  * ≤ mapTasks·keys·k rows, and the per-key merge combines bounded
  * partials in O(log k) per element — no window, no skew funnel, no
  * unbounded `collect_list` buffer. (An earlier version salted the key
  * and sliced AFTER the aggregate; that bounded the reduce fan-in but
  * the partial buffers still carried every row. The bounded buffer
  * makes salting unnecessary.)
  *
  * Version coupling: `CollectTopK` is `private[sql]` Spark internals with
  * no compatibility contract. A *compile-time* signature change fails the
  * build (ColumnBridge compiles against it directly); a *runtime* Spark
  * other than the pinned minor line could change its semantics silently,
  * so [[grouped]] checks `SPARK_VERSION` at runtime and falls back to the
  * window plan — slower but public-API-stable — logging the downgrade
  * once. `ScaleOpsSpec` pins both paths to identical output.
  */
object TopK {

  /** The Spark minor line `ColumnBridge.collectTopK` was built and
    * verified against. Bump deliberately (re-running the bridge tests)
    * when upgrading Spark.
    */
  private[graft] val PinnedSparkMinor = "4.1."

  private[graft] def bridgeUsable: Boolean =
    org.apache.spark.SPARK_VERSION.startsWith(PinnedSparkMinor)

  private lazy val warnOnce: Unit =
    System.err.println(
      s"[graft.TopK] Spark ${org.apache.spark.SPARK_VERSION} != pinned " +
        s"$PinnedSparkMinor*: private CollectTopK bridge unverified, " +
        "using public window fallback (correct, not bounded-buffer)")

  /** Top `k` rows per `keyCol`, ordered by `orderCol` descending with
    * `idCol` as the deterministic tie-break — descending by default,
    * ascending with `idAscending = true` (the exact-ANN baseline's
    * convention). Returns (keyCol, rank 1..k, orderCol, idCol).
    *
    * The ascending tie-break keeps the bounded-aggregate scale path for
    * integral id types by flipping the id with bitwise NOT — a total,
    * order-reversing bijection on two's-complement integers (~x = -x-1,
    * so unlike arithmetic negation it has no `Long.MinValue` overflow)
    * — and un-flipping on output. Any other orderable id type (string,
    * decimal, timestamp) routes to the public window path, which orders
    * natively: correct for every type, minus the bounded-buffer bound.
    */
  /** Id types eligible for the bitwise-NOT ascending-tie-break flip —
    * shared by every argmax/top-k site that plays the ~id trick
    * ([[grouped]], `Dedup.clusterRepresentatives`), so the whitelist
    * can never diverge between them. */
  private[graft] def integralIdType(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  def grouped(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, k: Int, idAscending: Boolean = false): DataFrame = {
    require(k > 0)
    val integralId = integralIdType(df.schema(idCol).dataType)
    if (!bridgeUsable) { warnOnce; groupedViaWindow(df, keyCol, orderCol, idCol, k, idAscending) }
    else if (!idAscending) groupedViaBoundedAgg(df, keyCol, orderCol, idCol, k)
    else if (integralId)
      groupedViaBoundedAgg(df.withColumn(idCol, bitwise_not(col(idCol))),
        keyCol, orderCol, idCol, k)
        .withColumn(idCol, bitwise_not(col(idCol)))
    else groupedViaWindow(df, keyCol, orderCol, idCol, k, idAscending = true)
  }

  private[graft] def groupedViaBoundedAgg(df: DataFrame, keyCol: String,
      orderCol: String, idCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(ColumnBridge.collectTopK(
        struct(col(orderCol), col(idCol)), k).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("_r", "s")))
      .select(col(keyCol), (col("_r") + 1).cast("long").as("rank"),
        col(s"s.$orderCol").as(orderCol), col(s"s.$idCol").as(idCol))

  /** Public-API fallback: row_number over a window. Identical output
    * ordering contract (orderCol DESC, idCol tie-break per flag, rank
    * 1..k); pays the per-key funnel the bounded aggregate avoids.
    */
  private[graft] def groupedViaWindow(df: DataFrame, keyCol: String,
      orderCol: String, idCol: String, k: Int,
      idAscending: Boolean = false): DataFrame =
    df.select(col(keyCol), col(orderCol), col(idCol))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(orderCol).desc,
            if (idAscending) col(idCol).asc else col(idCol).desc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col(keyCol), col("rank"), col(orderCol), col(idCol))
}
