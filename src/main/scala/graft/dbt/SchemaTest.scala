package graft.dbt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative schema tests (D7), mirroring dbt's four generic tests as
  * used in `models/staging/schema.yml` and `models_demo/schema.yml`.
  * Each compiles to a query returning VIOLATING rows; non-empty ⇒ fail —
  * exactly dbt's contract. `violations` stays lazy (a DataFrame); the
  * runner decides when to count, and at scale uses `limit(1)` existence
  * checks rather than full counts.
  */
sealed trait SchemaTest {
  def testName: String
  /** Rows violating the constraint. `resolve` maps a model name to its
    * built relation (for relationship tests).
    */
  def violations(df: DataFrame, resolve: String => DataFrame): DataFrame
}

object SchemaTest {

  /** `not_null` — `models/staging/schema.yml:9-30` etc. */
  final case class NotNull(column: String) extends SchemaTest {
    val testName = s"not_null_$column"
    def violations(df: DataFrame, resolve: String => DataFrame): DataFrame =
      df.filter(col(column).isNull)
  }

  /** `unique` — `models_demo/schema.yml:9-11`. */
  final case class Unique(column: String) extends SchemaTest {
    val testName = s"unique_$column"
    def violations(df: DataFrame, resolve: String => DataFrame): DataFrame =
      df.groupBy(col(column)).count().filter(col("count") > 1)
  }

  /** `accepted_values` — `models_demo/schema.yml:33-35`. NULLs pass (dbt
    * semantics: accepted_values tests only non-null values).
    */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends SchemaTest {
    val testName = s"accepted_values_$column"
    def violations(df: DataFrame, resolve: String => DataFrame): DataFrame =
      df.filter(col(column).isNotNull &&
        !col(column).isin(values.map(v => v: Any): _*))
  }

  /** `relationships(to, field)` — `models_demo/schema.yml:36-41`. NULL
    * child keys pass (dbt tests only non-null FKs).
    */
  final case class Relationships(column: String, toModel: String,
      toField: String) extends SchemaTest {
    val testName = s"relationships_${column}_to_$toModel"
    def violations(df: DataFrame, resolve: String => DataFrame): DataFrame = {
      val parent = resolve(toModel).select(col(toField).as("__parent_key"))
      df.filter(col(column).isNotNull)
        .join(parent, col(column) === col("__parent_key"), "left_anti")
    }
  }

  /** One summary row per test over a model — the d7 reporting shape. */
  def report(model: String, tests: Seq[SchemaTest], df: DataFrame,
      resolve: String => DataFrame): Seq[(String, Long)] =
    tests.map(t => (s"${model}.${t.testName}",
      t.violations(df, resolve).limit(1000000).count()))
}
