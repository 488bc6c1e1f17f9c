package graft.dbt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt snapshots — SCD2 change capture with the `timestamp` strategy.
  *
  * The reference repo declares a `snapshots/` directory but ships none
  * (SURVEY §5), so this is beyond-reference completeness: a dbt user
  * switching to this engine gets the flagship snapshot semantics —
  * `dbt_valid_from` / `dbt_valid_to` versioning where an incoming row
  * whose `updated_at` is NEWER than the key's current version closes
  * that version and opens a new one, and everything else is untouched.
  *
  * Contract per dbt: each batch carries at most one row per `key` (the
  * source is a mutable table's current state); a re-delivered unchanged
  * row (same or older `updated_at`) is a no-op, so replayed batches are
  * idempotent.
  *
  * Scale design (100 TB): the batch is the full source state (one row
  * per key), so the version-detection and close-out joins are
  * key-equi shuffles — bucket both the snapshot's current slice and
  * the source by `key` ([[graft.sources.Warehouse.writeBucketed]]) and
  * they co-locate with no exchange. `history` (closed versions) is
  * NEVER rewritten — only the current-version slice joins the batch;
  * persist the table partitioned on an `is_current` flag so the
  * close-out rewrite touches the current partition only and history is
  * append-only, which composes with the manifest-committed layout for
  * the swap.
  */
object Snapshots {

  /** Apply one source delivery to an optional existing snapshot table.
    *
    * @param existing snapshot table with `dbt_valid_from`/`dbt_valid_to`
    *                 (None on the first run)
    * @param batch    current source state, ≤ 1 row per key
    * @param key      unique key column
    * @param updatedAt event-time column driving the timestamp strategy
    * @return the full new snapshot table (caller owns the write)
    */
  def applyBatch(existing: Option[DataFrame], batch: DataFrame,
      key: String, updatedAt: String): DataFrame = {
    val tsType = batch.schema(batch.schema.fieldIndex(updatedAt)).dataType
    def opened(df: DataFrame): DataFrame = df
      .withColumn("dbt_valid_from", col(updatedAt))
      .withColumn("dbt_valid_to", lit(null).cast(tsType))
    existing match {
      case None => opened(batch)
      case Some(ex) =>
        val history = ex.filter(col("dbt_valid_to").isNotNull)
        val current = ex.filter(col("dbt_valid_to").isNull)
        // a batch row is a NEW version iff its key is absent or its
        // updated_at is strictly newer than the current version's start
        val changes = batch
          .join(current.select(col(key),
            col("dbt_valid_from").as("_cur_from")), Seq(key), "left")
          .filter(col("_cur_from").isNull || col(updatedAt) > col("_cur_from"))
          .drop("_cur_from")
        val changeTs = changes.select(col(key), col(updatedAt).as("_new_from"))
        val closed = current.join(changeTs, Seq(key))
          .withColumn("dbt_valid_to", col("_new_from"))
          .drop("_new_from")
        val stillCurrent = current
          .join(changeTs.select(col(key)), Seq(key), "left_anti")
        history.unionByName(closed).unionByName(stillCurrent)
          .unionByName(opened(changes))
    }
  }
}
