package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *  - A canonical column present in the delivery is conformed to the
  *    canonical type — recursively for structs and arrays-of-struct,
  *    `try_cast` at the leaves, so type drift yields NULL in the cell,
  *    never a failed job (FAILFAST on day 30 of a backfill is an
  *    outage; NULLs are countable and quarantinable downstream).
  *  - A canonical column/field absent from the delivery becomes a
  *    typed NULL — at any nesting depth (the reference's own GBFS
  *    payloads are 3-level structs whose inner fields come and go:
  *    `src/realtime_pubsub_to_spark.py:60-79` parses them,
  *    `src/pyspark_gbfs_raw_load.py:74-83` drops `station_area`).
  *  - Columns/fields the canonical schema doesn't know are dropped, or
  *    kept in one JSON `extras` column for forensics when `extrasCol`
  *    is set, keyed by path (`meta.area`, `tags[].src`). Keys are
  *    stable across rows (`ignoreNullFields=false`): a NULL cell in an
  *    unknown column still records its key.
  *  - Name matching is case-insensitive (Spark's own default
  *    resolution), exact match preferred when a delivery carries both
  *    casings.
  * Everything is a map-side projection Catalyst folds into the scan —
  * no shuffle, no driver-side row handling, and column pruning still
  * reaches the parquet reader for canonical columns the query drops.
  *
  * parquet `mergeSchema` is deliberately NOT the mechanism: it fails
  * the whole scan on physical type conflicts (LONG vs STRING), i.e. on
  * precisely the deliveries this operator exists to admit.
  */
object SchemaDrift {

  /** One drifted canonical column/field: how the delivery's shape was
    * reconciled. `kind` ∈ cast | null-fill; `path` is dotted. */
  final case class Drift(path: String, kind: String)

  /** Recursively conform `src` (typed `srcType`) to `target`.
    * Returns the conformed column, the unknown-subtree columns keyed by
    * path (for the extras quarantine), and the drift record. */
  private def conformCol(src: Column, srcType: DataType, target: DataType,
      path: String): (Column, Seq[(String, Column)], Seq[Drift]) =
    (srcType, target) match {
      case (s, t) if s == t => (src, Nil, Nil)
      case (s: StructType, t: StructType) =>
        val exact = s.fields.map(f => f.name -> f).toMap
        val lower = s.fields.map(f => f.name.toLowerCase -> f).toMap
        val parts = t.fields.toSeq.map { tf =>
          exact.get(tf.name).orElse(lower.get(tf.name.toLowerCase)) match {
            case Some(sf) =>
              val (c, ex, dr) = conformCol(src.getField(sf.name),
                sf.dataType, tf.dataType, s"$path.${tf.name}")
              (c.as(tf.name), ex, dr)
            case None =>
              (lit(null).cast(tf.dataType).as(tf.name), Nil,
                Seq(Drift(s"$path.${tf.name}", "null-fill")))
          }
        }
        val known = t.fieldNames.map(_.toLowerCase).toSet
        val unknown = s.fields.toSeq
          .filterNot(f => known.contains(f.name.toLowerCase))
          .map(f => s"$path.${f.name}" -> src.getField(f.name))
        // a NULL struct cell must stay NULL, not become a struct of NULLs
        val rebuilt = when(src.isNull, lit(null).cast(t))
          .otherwise(struct(parts.map(_._1): _*))
        (rebuilt, parts.flatMap(_._2) ++ unknown, parts.flatMap(_._3))
      case (ArrayType(se: StructType, _), ArrayType(te: StructType, tn)) =>
        // conform each element via transform (stays inside codegen);
        // unknown element fields are quarantined as a parallel array of
        // the dropped subtrees under `path[]`. (Unknown fields nested
        // deeper than one struct level inside array elements are
        // dropped — the quarantine contract is top-level-per-element.)
        val known = te.fieldNames.map(_.toLowerCase).toSet
        val unknownFields = se.fields.toSeq
          .filterNot(f => known.contains(f.name.toLowerCase))
        val rebuilt = transform(src,
          x => conformCol(x, se, te, path)._1).cast(ArrayType(te, tn))
        val drifts = conformCol(lit(null).cast(se), se, te, s"$path[]")._3
        val ex =
          if (unknownFields.isEmpty) Nil
          else Seq(s"$path[]" -> transform(src, x => struct(
            unknownFields.map(f => x.getField(f.name).as(f.name)): _*)))
        (rebuilt, ex, drifts)
      case _ =>
        // leaf type drift: try_cast via the Column API (backtick-safe),
        // codegen'd, NULL (not error) on unconvertible cells
        (src.try_cast(target), Nil, Seq(Drift(path, "cast")))
    }

  /** Column reference that survives backticks/dots in the name. */
  private def topCol(df: DataFrame, name: String): Column = df.col(
    "`" + name.replace("`", "``") + "`")

  /** Conform one delivery to `canonical`, with the drift record as a
    * side channel for callers that surface it (see `Tables.table`). */
  def conformToWithReport(df: DataFrame, canonical: StructType,
      extrasCol: Option[String] = None): (DataFrame, Seq[Drift]) = {
    // a delivery carrying two columns differing only in case would make
    // df.col ambiguous under Spark's case-insensitive resolution — give
    // every column a unique working name first, then address those
    val origNames = df.schema.fieldNames.toSeq
    val hasCaseDup =
      origNames.map(_.toLowerCase).distinct.length != origNames.length
    val work = if (hasCaseDup)
      df.toDF(origNames.indices.map(i => s"__drift_c$i"): _*) else df
    // (origName, workName, field-as-delivered)
    val cols = origNames.zipWithIndex.map { case (orig, i) =>
      (orig, work.schema.fields(i).name, df.schema.fields(i))
    }
    val exact = cols.map(c => c._1 -> c).toMap
    val lower = cols.reverse.map(c => c._1.toLowerCase -> c).toMap
    require(extrasCol.forall(e => !canonical.fieldNames.contains(e)),
      "extras column name collides with a canonical column")
    val conformed = canonical.fields.toSeq.map { f =>
      exact.get(f.name).orElse(lower.get(f.name.toLowerCase)) match {
        // shape already canonical: pass the column through UNCAST, so
        // predicate pushdown on it still reaches the parquet reader
        // even when a sibling column drifted
        case Some((_, workName, src)) if src.dataType == f.dataType =>
          (topCol(work, workName).as(f.name),
            Seq.empty[(String, Column)], Seq.empty[Drift])
        case Some((_, workName, src)) =>
          val (c, ex, dr) = conformCol(topCol(work, workName), src.dataType,
            f.dataType, f.name)
          (c.as(f.name), ex, dr)
        case None =>
          (lit(null).cast(f.dataType).as(f.name), Nil,
            Seq(Drift(f.name, "null-fill")))
      }
    }
    val knownLower = canonical.fieldNames.map(_.toLowerCase).toSet
    val unknownTop = cols
      .filterNot { case (orig, _, _) => knownLower.contains(orig.toLowerCase) }
      .map { case (orig, workName, _) => orig -> topCol(work, workName) }
    val quarantine = (unknownTop ++ conformed.flatMap(_._2)).sortBy(_._1)
    val extras: Seq[Column] = extrasCol.toSeq.map { name =>
      (if (quarantine.isEmpty) lit(null).cast("string")
       else to_json(
         struct(quarantine.map { case (p, c) => c.as(p) }: _*),
         Map("ignoreNullFields" -> "false"))).as(name)
    }
    val drifts = conformed.flatMap(_._3) ++
      (if (extrasCol.isEmpty) Nil
       else quarantine.map(q => Drift(q._1, "extras")))
    (work.select(conformed.map(_._1) ++ extras: _*), drifts)
  }

  /** Conform one delivery to `canonical`. See object doc for semantics. */
  def conformTo(df: DataFrame, canonical: StructType,
      extrasCol: Option[String] = None): DataFrame =
    conformToWithReport(df, canonical, extrasCol)._1

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
