package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  */
object TopK {

  /** Top `k` rows per `keyCol`, ordered by (`orderCol`, `idCol`)
    * descending — the id is the deterministic tie-break. Returns
    * (keyCol, rank 1..k, orderCol, idCol).
    */
  def grouped(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0)
    df.groupBy(col(keyCol))
      .agg(ColumnBridge.collectTopK(
        struct(col(orderCol), col(idCol)), k).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("_r", "s")))
      .select(col(keyCol), (col("_r") + 1).cast("long").as("rank"),
        col(s"s.$orderCol").as(orderCol), col(s"s.$idCol").as(idCol))
  }
}
