package graft

import org.apache.spark.sql.DataFrame
import graft.dbt._
import graft.dbt.SchemaTest._

/** D7 — the four dbt generic tests on clean + dirty fixtures, and the
  * runner failing a DAG whose tests fail.
  */
class SchemaTestSpec extends SparkSpec {
  import spark.implicits._

  private def resolveNothing: String => DataFrame =
    n => sys.error(s"unexpected resolve $n")

  test("not_null flags NULL rows only") {
    val df = Seq(Some(1), None, Some(3)).toDF("k")
    assert(NotNull("k").violations(df, resolveNothing).count() == 1)
    assert(NotNull("k").violations(df.na.drop(), resolveNothing).count() == 0)
  }

  test("unique flags duplicated keys once per key") {
    val df = Seq(1, 2, 2, 3, 3, 3).toDF("k")
    val v = Unique("k").violations(df, resolveNothing)
    assert(v.count() == 2) // keys 2 and 3
  }

  test("accepted_values passes NULLs, flags strangers") {
    val df = Seq(Some("placed"), Some("cancelled"), None).toDF("status")
    val v = AcceptedValues("status", Seq("placed", "shipped"))
      .violations(df, resolveNothing)
    assert(v.count() == 1)
    assert(v.head().getString(0) == "cancelled")
  }

  test("relationships flags orphans, passes NULL FKs") {
    val child = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val v = Relationships("fk", "parents", "pk")
      .violations(child, _ => parent)
    assert(v.count() == 1)
    assert(v.head().getInt(0) == 99)
  }

  test("DagRunner fails the run when a declared test fails") {
    val reg = new ModelRegistry().register(Model(
      name = "bad", deps = Nil, materialization = Materialization.View,
      build = _ => Seq(Some(1), None).toDF("k"),
      tests = Seq(NotNull("k"))))
    val runner = new DagRunner(spark, reg, (_, _) => sys.error("none"),
      tmpDir("st-wh"))
    val e = intercept[RuntimeException](runner.run())
    assert(e.getMessage.contains("bad.not_null_k"))
  }

  test("DagRunner topo-sorts and rejects cycles") {
    val reg = new ModelRegistry()
      .register(Model("a", Seq("b"), Materialization.Ephemeral, ctx => ctx.ref("b")))
      .register(Model("b", Seq("a"), Materialization.Ephemeral, ctx => ctx.ref("a")))
    assertThrows[IllegalArgumentException](reg.topoOrder)
  }
}
