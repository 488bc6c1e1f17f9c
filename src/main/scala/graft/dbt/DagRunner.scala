package graft.dbt

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Model registry + DAG executor: the Spark-native replacement for dbt's
  * parse/plan/execute lifecycle (SURVEY §3.1 stages 1-3).
  *
  * Registration order is irrelevant; execution is topological over
  * declared deps (D6). Materialization decides the persistence boundary
  * (D1-D4): only Table/Incremental cross a write — everything else stays
  * a lazy Catalyst plan, so ephemeral/view chains fuse into their
  * consumers exactly like dbt's ephemeral CTE inlining, with predicate
  * pushdown and column pruning across model boundaries for free.
  */
final class ModelRegistry {
  private val models = mutable.LinkedHashMap.empty[String, Model]

  def register(m: Model): this.type = {
    require(!models.contains(m.name), s"duplicate model ${m.name}")
    // dedupe deps: the indegree count below is per-edge, and a repeated
    // dep entry would otherwise read as an unsatisfiable edge (fake cycle)
    models += m.name -> m.copy(deps = m.deps.distinct)
    this
  }

  def apply(name: String): Model =
    models.getOrElse(name, sys.error(s"unknown model $name"))
  def all: Seq[Model] = models.values.toSeq

  /** Kahn topo-sort; deterministic (registration order among ready nodes);
    * cycles are a hard error.
    */
  def topoOrder: Seq[String] = {
    val indeg = mutable.LinkedHashMap(models.keys.map(_ -> 0).toSeq: _*)
    for (m <- models.values; d <- m.deps if models.contains(d)) indeg(m.name) += 1
    val ready = mutable.Queue(indeg.collect { case (n, 0) => n }.toSeq: _*)
    val out = mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += n
      for (m <- models.values if m.deps.contains(n) && models.contains(m.name)) {
        indeg(m.name) -= 1
        if (indeg(m.name) == 0) ready += m.name
      }
    }
    require(out.size == models.size,
      s"cycle among ${models.keySet.diff(out.toSet).mkString(", ")}")
    out.toSeq
  }
}

/** Executes a registry against a warehouse directory.
  *
  * @param sources   (sourceName, tableName) → raw relation (S1/S2)
  * @param warehouse dir for Table/Incremental parquet; layout is
  *                  `<warehouse>/<model>` — at cluster scale point this at
  *                  object storage and nothing else changes.
  */
final class DagRunner(
    spark: SparkSession,
    registry: ModelRegistry,
    sources: (String, String) => DataFrame,
    warehouse: String,
    config: EngineConfig = EngineConfig()) {

  private val built = mutable.LinkedHashMap.empty[String, DataFrame]

  private def path(name: String) = s"$warehouse/$name"

  private def exists(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def resolve(name: String): DataFrame =
    built.getOrElse(name, sys.error(s"model $name not built yet"))

  /** Run the full DAG (or a sub-selection plus its upstreams). Returns the
    * materialized relation per model. Test failures raise after the full
    * report is computed. `fullRefresh` rebuilds incremental models from
    * scratch (dbt's --full-refresh).
    */
  def run(select: Seq[String] = Nil, runTests: Boolean = true,
      fullRefresh: Boolean = false): Map[String, DataFrame] = {
    val wanted: Set[String] =
      if (select.isEmpty) registry.all.map(_.name).toSet
      else {
        val closure = mutable.Set.empty[String]
        def visit(n: String): Unit = if (closure.add(n))
          registry(n).deps.foreach(visit)
        select.foreach(visit)
        closure.toSet
      }
    val failures = mutable.ArrayBuffer.empty[(String, Long)]

    for (name <- registry.topoOrder if wanted(name)) {
      val m = registry(name)
      val selfRaw =
        if (!fullRefresh &&
          m.materialization.isInstanceOf[Materialization.Incremental] &&
          exists(name)) Some(spark.read.parquet(path(name)))
        else None
      // scanPredicate scopes every read of the existing table — the
      // model's own `{{ this }}` NOT-IN as well as the runner's key
      // guard below — so the incremental dedup check partition-prunes
      // instead of rescanning full history
      val self = (selfRaw, m.materialization) match {
        case (Some(df0), Materialization.Incremental(_, Some(p), _, _)) =>
          Some(df0.filter(p))
        case _ => selfRaw
      }
      val ctx = ModelContext(spark, config, sources, resolve, self)
      val df = m.build(ctx)

      val materialized = m.materialization match {
        case Materialization.Ephemeral => df
        case Materialization.View =>
          df.createOrReplaceTempView(name); df
        case Materialization.Table =>
          df.write.mode("overwrite").parquet(path(name))
          spark.read.parquet(path(name))
        case Materialization.Snapshot(key, updatedAt) =>
          val existingOpt =
            if (!fullRefresh && exists(name))
              Some(spark.read.parquet(path(name)))
            else None
          val snap = Snapshots.applyBatch(existingOpt, df, key, updatedAt)
          // staged: the SCD2 plan reads the existing table's files, so an
          // in-place overwrite would race its own scan
          val staged = path(name) + "__snap"
          snap.write.mode("overwrite").parquet(staged)
          spark.read.parquet(staged).write.mode("overwrite").parquet(path(name))
          val fs = new org.apache.hadoop.fs.Path(staged)
            .getFileSystem(spark.sessionState.newHadoopConf())
          fs.delete(new org.apache.hadoop.fs.Path(staged), true)
          spark.read.parquet(path(name))
        case Materialization.Incremental(keys, _, parts, strategy) =>
          def partitioned(w: org.apache.spark.sql.DataFrameWriter[
              org.apache.spark.sql.Row]) =
            if (parts.nonEmpty) w.partitionBy(parts: _*) else w
          def rmStaged(staged: String): Unit = {
            val fs = new org.apache.hadoop.fs.Path(staged)
              .getFileSystem(spark.sessionState.newHadoopConf())
            fs.delete(new org.apache.hadoop.fs.Path(staged), true)
          }
          self match {
            case None =>
              partitioned(df.write.mode("overwrite")).parquet(path(name))
            case Some(existing)
                if strategy == Materialization.IncrementalStrategy.Merge =>
              // MERGE/upsert: batch rows replace same-key rows. Rewrite
              // only the partitions the batch touches: survivors =
              // (existing ⋉ touched partitions) ∖ batch keys, staged
              // together with the batch, then swapped in via DYNAMIC
              // partition overwrite — untouched partitions never move,
              // so cost ∝ churn, not table size. The UNSCOPED existing
              // table is read here (partition pruning is the scope):
              // scanPredicate bounds the dedup window, but an in-window
              // rewrite must not drop out-of-window rows that share a
              // touched partition. Unpartitioned tables degrade to a
              // staged full rewrite (documented; give a merge model
              // partitions).
              //
              // Touched partitions = batch partition values ∪ partitions
              // that CURRENTLY hold a batch key: dbt merge matches on
              // key regardless of location, so a re-delivered key whose
              // partition-column value changed (e.g. a corrected
              // event_date) must evict its old row from the OLD
              // partition too. Finding those rows is a column-pruned
              // (key + partition cols only) scan of the table — the
              // price of supporting key relocation; when partitions are
              // a stable function of the key this returns ⊆ batch
              // partitions and costs one footer-level scan.
              val existingFull = spark.read.parquet(path(name))
              val batchKeys = df.select(keys.map(col): _*).distinct()
              def bc(d: DataFrame): DataFrame =
                org.apache.spark.sql.functions.broadcast(d)
              val touched =
                if (parts.nonEmpty)
                  df.select(parts.map(col): _*).distinct().unionByName(
                    existingFull.join(bc(batchKeys), keys, "left_semi")
                      .select(parts.map(col): _*).distinct()).distinct()
                else null
              val survivors =
                (if (parts.nonEmpty)
                  existingFull.join(bc(touched), parts, "left_semi")
                else existingFull)
                  .join(batchKeys, keys, "left_anti")
              val merged = df.unionByName(
                survivors.select(df.columns.map(col).toIndexedSeq: _*))
              val staged = path(name) + "__merge"
              partitioned(merged.write.mode("overwrite")).parquet(staged)
              // Materialize partition bookkeeping BEFORE the swap: both
              // plans read the pre-overwrite file listing, which the
              // dynamic overwrite below invalidates. Bounded by the
              // touched-partition count (∝ churn, not table size).
              val vacated: Set[Seq[Any]] =
                if (parts.isEmpty) Set.empty
                else {
                  val stagedParts = spark.read.parquet(staged)
                    .select(parts.map(col): _*).distinct().collect()
                    .map(_.toSeq).toSet
                  touched.collect().map(_.toSeq).toSet -- stagedParts
                }
              val prevMode =
                spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
              try {
                if (parts.nonEmpty)
                  spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                    "dynamic")
                partitioned(spark.read.parquet(staged).write.mode("overwrite"))
                  .parquet(path(name))
              } finally
                spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                  prevMode)
              // A partition fully VACATED by relocation (its only rows
              // moved to other partitions) produces zero output rows, so
              // dynamic overwrite never visits it — its stale directory
              // must be dropped explicitly.
              if (vacated.nonEmpty) {
                import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                val fs = new org.apache.hadoop.fs.Path(path(name))
                  .getFileSystem(spark.sessionState.newHadoopConf())
                for (vals <- vacated) {
                  val rel = parts.zip(vals).map { case (c, v) =>
                    val s = if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                            else ExternalCatalogUtils.escapePathName(v.toString)
                    s"$c=$s"
                  }.mkString("/")
                  fs.delete(new org.apache.hadoop.fs.Path(s"${path(name)}/$rel"), true)
                }
              }
              rmStaged(staged)
            case Some(existing) =>
              // `existing` is already scanPredicate-scoped above.
              // Append-only-new-keys guard (D4); the reference models
              // already NOT-IN-filter, this keeps the contract even if a
              // model forgets. Write to a staging dir first: appending
              // while `existing` still lazily reads the same files would
              // race the scan.
              val newRows = df.join(existing.select(keys.map(col): _*),
                keys, "left_anti")
              val staged = path(name) + "__delta"
              partitioned(newRows.write.mode("overwrite")).parquet(staged)
              partitioned(spark.read.parquet(staged).write.mode("append"))
                .parquet(path(name))
              rmStaged(staged)
          }
          spark.read.parquet(path(name))
      }
      built(name) = materialized

      if (runTests && m.tests.nonEmpty)
        SchemaTest.report(name, m.tests, materialized, resolve)
          .foreach { case (t, n) => if (n > 0) failures += ((t, n)) }
    }

    if (failures.nonEmpty)
      sys.error("schema tests failed: " +
        failures.map { case (t, n) => s"$t($n)" }.mkString(", "))
    built.toMap
  }
}
