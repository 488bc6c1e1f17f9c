package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for hot keys (the 100 TB concern in SURVEY §7.4
  * risk 6: station_id-like keys where a few ids dominate).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on in GraftSession) — prefer
  * it. Salting is for the cases AQE can't fix: a skewed **aggregation**
  * key, or a skewed join against a side too large to broadcast, where the
  * single hot partition would OOM an executor.
  */
object Skew {

  /** Two-stage aggregation over a skewed group key: group on
    * (key, salt) first — spreading a hot key over `saltFactor` reducers —
    * then combine the partials. Works for any algebraic aggregate
    * expressed as (partial, merge) column pairs.
    *
    * Example: saltedCount(df, $"station_id", 16)
    */
  def saltedCount(df: DataFrame, key: Column, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial_n")).as("n"))
  }

  /** Salted left-side join against a replicable right side: the skewed
    * left gets a random salt in [0, saltFactor); the right side is
    * exploded `saltFactor`× so every (key, salt) pair finds its match.
    * Use when the right side is too big for broadcast but small enough to
    * replicate saltFactor× through the shuffle (dim-table sized).
    */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer are unsupported: the replicated right side would
    // emit saltFactor copies of every unmatched right row
    require(!joinType.toLowerCase.matches(".*(right|full).*"),
      s"saltedJoin does not support joinType=$joinType")
    val saltedL = skewedLeft.withColumn("__salt",
      pmod(hash(monotonically_increasing_id(), spark_partition_id()),
        lit(saltFactor)))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedL.join(saltedR, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
