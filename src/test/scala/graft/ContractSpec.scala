package graft

/** Driver-contract invariants: entry() smoke, oracle keys ⊆ query keys,
  * and a spot check that representative queries run at sf0.001.
  */
class ContractSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries twin") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("representative queries run non-empty at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    Seq("p1_project_rename", "j2_join_agg_mart", "w1_latest_per_key",
      "g3_dim_date", "x_dedup_exact", "x_cosine_topk")
      .foreach { name =>
        assert(SparkEntry.queries(name)(spark, dir).count() > 0, name)
      }
  }
}
