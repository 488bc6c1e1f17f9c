package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-drift-tolerant delivery ingestion (§2.1 extension).
  *
  * A multi-year crawl corpus is delivered in batches whose schemas
  * drift: columns appear in later generations, disappear from early
  * ones, and change physical type (the round-9 testdata regeneration —
  * `ts` flipping TIMESTAMP(NANOS) → TIMESTAMP_NTZ µs and crashing 16
  * queries at plan time — is exactly this failure mode hitting a loader
  * with a hardcoded schema assumption). At 100 TB "re-deliver the old
  * batches in the new schema" is not an option, so the engine must
  * conform every delivery to ONE canonical schema at scan time.
  *
  * Design: per-delivery declarative projection, then `unionByName`.
  *  - A canonical column present in the delivery is `try_cast` to the
  *    canonical type — type drift yields NULL in the cell, never a
  *    failed job (FAILFAST on day 30 of a backfill is an outage; NULLs
  *    are countable and quarantinable downstream).
  *  - A canonical column absent from the delivery becomes a typed NULL.
  *  - Columns the canonical schema doesn't know are dropped, or kept as
  *    one JSON `extras` column for forensics when `extrasCol` is set.
  * Everything is a map-side projection Catalyst folds into the scan —
  * no shuffle, no driver-side row handling, and column pruning still
  * reaches the parquet reader for canonical columns the query drops.
  *
  * parquet `mergeSchema` is deliberately NOT the mechanism: it fails
  * the whole scan on physical type conflicts (LONG vs STRING), i.e. on
  * precisely the deliveries this operator exists to admit.
  */
object SchemaDrift {

  /** Conform one delivery to `canonical`. See object doc for semantics. */
  def conformTo(df: DataFrame, canonical: StructType,
      extrasCol: Option[String] = None): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    require(extrasCol.forall(e => !canonical.fieldNames.contains(e)),
      "extras column name collides with a canonical column")
    val conformed: Seq[Column] = canonical.fields.toSeq.map { f =>
      byName.get(f.name) match {
        // type already canonical: pass the column through UNCAST, so
        // predicate pushdown on it still reaches the parquet reader
        // even when a sibling column drifted
        case Some(src) if src.dataType == f.dataType => col(f.name)
        case Some(_) =>
          // expression-form try_cast: tolerant of any source type,
          // codegen'd, and NULL (not error) on unconvertible cells
          expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    val extras: Seq[Column] = extrasCol.toSeq.flatMap { name =>
      val unknown = df.schema.fieldNames.filterNot(canonical.fieldNames.contains)
      Seq(
        (if (unknown.isEmpty) lit(null).cast("string")
         else to_json(struct(unknown.sorted.map(col).toIndexedSeq: _*))).as(name))
    }
    df.select(conformed ++ extras: _*)
  }

  /** Read a set of delivery paths, conforming each independently (their
    * schemas may be mutually cast-incompatible) and unioning by name.
    * One scan per delivery generation — the per-file work is identical
    * to a plain scan plus a projection, so this costs O(data read), and
    * partition-count/pushdown behavior is each underlying scan's own.
    */
  def readConformed(spark: SparkSession, deliveries: Seq[String],
      canonical: StructType, extrasCol: Option[String] = None): DataFrame = {
    require(deliveries.nonEmpty, "readConformed needs at least one delivery")
    deliveries
      .map(p => conformTo(spark.read.parquet(p), canonical, extrasCol))
      .reduce(_.unionByName(_))
  }
}
