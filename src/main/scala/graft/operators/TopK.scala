package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable per-group top-k.
  *
  * The naive shape — `row_number() OVER (PARTITION BY key ORDER BY v)`
  * then `rank <= k` — funnels every row of a group through one task; for
  * low-cardinality keys (a handful of sources/languages over billions of
  * rows) that is the single-reducer bottleneck PlanAuditSpec rejects.
  *
  * This operator aggregates instead: a salted first level keeps per-task
  * state bounded at k rows per (key, salt) and combines map-side; the
  * second level merges the ≤ `nSalts`·k survivors per key. Both levels
  * are ordinary hash aggregations — no window, no skew, shuffle volume
  * ≤ keys·salts·k rows regardless of input size.
  */
object TopK {

  private def topSlice(items: Column, k: Int): Column =
    slice(reverse(array_sort(items)), 1, k)

  /** Top `k` rows per `keyCol`, ordered by (`orderCol`, `idCol`)
    * descending — the id is the deterministic tie-break. Returns
    * (keyCol, rank 1..k, orderCol, idCol).
    */
  def grouped(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, k: Int, nSalts: Int = 32): DataFrame = {
    require(k > 0 && nSalts > 0)
    val partial = df
      .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(nSalts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(topSlice(collect_list(struct(col(orderCol), col(idCol))), k)
        .as("part"))
      .select(col(keyCol), explode(col("part")).as("s"))
    partial
      .groupBy(col(keyCol))
      .agg(topSlice(collect_list(col("s")), k).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("_r", "s")))
      .select(col(keyCol), (col("_r") + 1).cast("long").as("rank"),
        col(s"s.$orderCol").as(orderCol), col(s"s.$idCol").as(idCol))
  }
}
