package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ingest.SchemaDrift

/** Conformance semantics for drift-tolerant delivery ingestion:
  * typed-NULL fill for absent columns, try_cast-NULL (not job failure)
  * for type drift, extras quarantine for unknown columns, and
  * order-independence of the conformed union.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private val canonical = StructType.fromDDL(
    "id BIGINT, name STRING, score DOUBLE")

  test("present columns are try_cast, absent become typed nulls, unknown dropped") {
    val delivery = Seq((1, "a", "2.5", "x"), (2, "b", "bad", "y"))
      .toDF("id", "name", "score", "junk") // id INT, score STRING
    val out = SchemaDrift.conformTo(delivery, canonical)
    // compare (name, type) — a source column already NOT NULL may stay so
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      canonical.map(f => (f.name, f.dataType)))
    val rows = out.orderBy("id").collect()
    assert(rows(0) == Row(1L, "a", 2.5))
    // unparseable cell -> NULL cell, job survives
    assert(rows(1) == Row(2L, "b", null))
  }

  test("absent canonical column is NULL of the canonical type") {
    val delivery = Seq((1L, "a")).toDF("id", "name")
    val out = SchemaDrift.conformTo(delivery, canonical)
    assert(out.schema("score").dataType.sql == "DOUBLE")
    assert(out.head().isNullAt(2))
  }

  test("extras column quarantines unknown fields as JSON, NULL when none") {
    val d1 = Seq((1L, "a", 1.0, "f7", 9)).toDF("id", "name", "score", "fetcher", "gen")
    val d2 = Seq((2L, "b", 2.0)).toDF("id", "name", "score")
    val o1 = SchemaDrift.conformTo(d1, canonical, Some("extras")).head()
    val o2 = SchemaDrift.conformTo(d2, canonical, Some("extras")).head()
    assert(o1.getString(3) == """{"fetcher":"f7","gen":9}""")
    assert(o2.isNullAt(3))
  }

  test("extras name colliding with a canonical column is rejected") {
    val d = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    intercept[IllegalArgumentException] {
      SchemaDrift.conformTo(d, canonical, Some("score"))
    }
  }

  test("readConformed unions mutually cast-incompatible deliveries by name") {
    val root = tmpDir("drift")
    // gen1: id narrowed to INT, no score; gen2: score as STRING + unknown col
    Seq((1, "a"), (2, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$root/gen1")
    Seq((3L, "c", "7.25", "f7")).toDF("id", "name", "score", "fetcher")
      .write.mode("overwrite").parquet(s"$root/gen2")
    val out = SchemaDrift.readConformed(spark,
      Seq(s"$root/gen1", s"$root/gen2"), canonical)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      canonical.map(f => (f.name, f.dataType)))
    assert(out.orderBy("id").collect().toSeq == Seq(
      Row(1L, "a", null), Row(2L, "b", null), Row(3L, "c", 7.25)))
    // delivery order must not change the result set
    val flipped = SchemaDrift.readConformed(spark,
      Seq(s"$root/gen2", s"$root/gen1"), canonical)
    assert(flipped.orderBy("id").collect().toSeq ==
      out.orderBy("id").collect().toSeq)
  }

  test("Tables.table conforms a drifted synthetic table to its canonical schema") {
    val root = tmpDir("drift-tables")
    // documents with doc_id narrowed to INT, n_chars drifted to STRING,
    // lang missing, plus an unknown column — the next-round-regeneration
    // scenario the canonical-DDL pinning exists for
    Seq((7, "hello world", "web", "123", "x"))
      .toDF("doc_id", "text", "source", "n_chars", "fetcher")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    val out = graft.sources.Tables.table(spark, root, "documents")
    assert(out.schema.map(f => (f.name, f.dataType.sql)).toSeq == Seq(
      ("doc_id", "BIGINT"), ("text", "STRING"), ("lang", "STRING"),
      ("source", "STRING"), ("n_chars", "BIGINT")))
    assert(out.head() == Row(7L, "hello world", null, "web", 123L))
    // un-drifted files pass through as the raw scan (no conform node)
    val clean = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    assert(!clean.queryExecution.analyzed.toString.contains("try_cast"))
  }

  test("struct columns conform recursively: gained+lost inner fields") {
    val nested = StructType.fromDDL(
      "id BIGINT, meta STRUCT<lang: STRING, n_chars: BIGINT, quality: DOUBLE>")
    // delivery meta LOST n_chars, GAINED area (unknown), carries quality
    // as STRING (one cell unparseable)
    val delivery = Seq(
      (1L, ("en", "7.5", "a1")),
      (2L, ("de", "bad", "a2"))
    ).toDF("id", "raw")
      .select(col("id"), struct(
        col("raw._1").as("lang"), col("raw._2").as("quality"),
        col("raw._3").as("area")).as("meta"))
    val out = SchemaDrift.conformTo(delivery, nested, Some("extras"))
    assert(out.schema("meta").dataType.sql ==
      "STRUCT<lang: STRING, n_chars: BIGINT, quality: DOUBLE>")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getStruct(1) == Row("en", null, 7.5))
    assert(rows(1).getStruct(1) == Row("de", null, null)) // try_cast NULL
    // unknown INNER field quarantined by path
    assert(rows(0).getString(2) == """{"meta.area":"a1"}""")
  }

  test("NULL struct cells stay NULL after conform") {
    val nested = StructType.fromDDL("id BIGINT, meta STRUCT<lang: STRING, q: DOUBLE>")
    val delivery = Seq((1L, Some("en")), (2L, None)).toDF("id", "lang")
      .select(col("id"),
        when(col("lang").isNotNull, struct(col("lang"))).as("meta"))
    val rows = SchemaDrift.conformTo(delivery, nested)
      .orderBy("id").collect()
    assert(rows(0).getStruct(1) == Row("en", null))
    assert(rows(1).isNullAt(1))
  }

  test("arrays of struct conform per element via transform") {
    val nested = StructType.fromDDL(
      "id BIGINT, tags ARRAY<STRUCT<tag: STRING, weight: DOUBLE>>")
    // element weight drifted to INT; element carries unknown src field
    val delivery = Seq((1L, Seq(("a", 3, "web"), ("b", 4, "cc"))))
      .toDF("id", "raw")
      .select(col("id"), transform(col("raw"), x => struct(
        x.getField("_1").as("tag"), x.getField("_2").as("weight"),
        x.getField("_3").as("src"))).as("tags"))
    val out = SchemaDrift.conformTo(delivery, nested, Some("extras"))
    assert(out.schema("tags").dataType.sql ==
      "ARRAY<STRUCT<tag: STRING, weight: DOUBLE>>")
    val r = out.head()
    assert(r.getSeq[Row](1) == Seq(Row("a", 3.0), Row("b", 4.0)))
    assert(r.getString(2) == """{"tags[]":[{"src":"web"},{"src":"cc"}]}""")
  }

  test("column matching is case-insensitive, exact match preferred") {
    val delivery = Seq((1, "a", 2.5)).toDF("ID", "Name", "SCORE")
    val out = SchemaDrift.conformTo(delivery, canonical)
    assert(out.head() == Row(1L, "a", 2.5))
    // both casings present: exact wins
    val both = Seq((1L, 9L, "a", 1.0)).toDF("id", "ID2", "name", "score")
      .withColumnRenamed("ID2", "ID")
    val canon2 = StructType.fromDDL("id BIGINT, name STRING, score DOUBLE")
    assert(SchemaDrift.conformTo(both, canon2).head().getLong(0) == 1L)
  }

  test("backticks in delivery column names do not break the projection") {
    val delivery = Seq((1, "x")).toDF("id", "weird`name")
    val canon = StructType.fromDDL("id BIGINT")
    val out = SchemaDrift.conformTo(delivery, canon, Some("extras"))
    assert(out.head() == Row(1L, """{"weird`name":"x"}"""))
  }

  test("extras keys are stable across rows (null cells keep their key)") {
    val delivery = Seq((1L, Some("f7")), (2L, None)).toDF("id", "fetcher")
    val canon = StructType.fromDDL("id BIGINT")
    val rows = SchemaDrift.conformTo(delivery, canon, Some("extras"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == """{"fetcher":"f7"}""")
    assert(rows(1).getString(1) == """{"fetcher":null}""")
  }

  test("conformance is a scan-side projection: no shuffle in the plan") {
    val root = tmpDir("drift-plan")
    Seq((1, "a")).toDF("id", "name").write.mode("overwrite")
      .parquet(s"$root/gen1")
    val out = SchemaDrift.readConformed(spark, Seq(s"$root/gen1"), canonical)
      .filter(col("id") > 0)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"conformed scan should not shuffle:\n$physical")
  }
}
