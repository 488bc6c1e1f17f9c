package graft

import graft.dbt._
import graft.dbt.Materialization._

/** Model.fromSql: the paste-the-dbt-SQL migration path. The jaffle-shop
  * chain written as near-verbatim reference SQL must equal the DataFrame
  * builders' output.
  */
class SqlModelSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-bodied jaffle shop equals the DataFrame DAG") {
    val reg = new ModelRegistry()
      .register(Model.fromSql("stg_customers", Nil, View,
        """SELECT id AS customer_id, first_name, last_name
           FROM demo_customers""",
        sources = Seq("demo" -> "customers")))
      .register(Model.fromSql("stg_orders", Nil, View,
        """SELECT id AS order_id, user_id AS customer_id, order_date, status
           FROM demo_orders""",
        sources = Seq("demo" -> "orders")))
      .register(Model.fromSql("stg_customer_orders", Seq("stg_orders"), Ephemeral,
        """SELECT customer_id,
             min(order_date) AS first_order_date,
             max(order_date) AS most_recent_order_date,
             count(order_id) AS number_of_orders
           FROM stg_orders GROUP BY 1"""))
      .register(Model.fromSql("customers",
        Seq("stg_customers", "stg_customer_orders"), Table,
        """SELECT customers.customer_id, customers.first_name,
             customers.last_name, customer_orders.first_order_date,
             customer_orders.most_recent_order_date,
             coalesce(customer_orders.number_of_orders, 0) AS number_of_orders
           FROM stg_customers AS customers
           LEFT JOIN stg_customer_orders AS customer_orders
             USING (customer_id)"""))
    val built = new DagRunner(spark, reg, GbfsFixtures.sources(spark),
      tmpDir("sql-wh")).run()
    val viaSql = built("customers")
      .orderBy("customer_id")
      .collect().map(_.toSeq).toSeq

    val dfReg = GbfsModels.registryDemoOnly()
    val viaDf = new DagRunner(spark, dfReg, GbfsFixtures.sources(spark),
      tmpDir("df-wh")).run()("customers")
      .orderBy("customer_id")
      .collect().map(_.toSeq).toSeq

    assert(viaSql == viaDf)
    assert(viaSql.size == 3)
  }

  private object GbfsModels {
    def registryDemoOnly(): ModelRegistry = {
      val r = new ModelRegistry()
      import graft.gbfs.GbfsModels._
      Seq(stgCustomers, stgOrders, stgCustomerOrders, customers).foreach(r.register)
      r
    }
  }
}
