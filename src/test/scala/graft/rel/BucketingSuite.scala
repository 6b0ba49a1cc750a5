package graft.rel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("co-located join of bucketed tables plans no shuffle") {
    val base = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = Queries.table(spark, dir, "orders")
    val customer = Queries.table(spark, dir, "customer")
    Bucketing.writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 8, s"$base/orders_b")
    Bucketing.writeBucketed(
      customer.select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 8, s"$base/customer_b")

    // bucketed joins only trigger without AQE coalescing interference on
    // tiny data when broadcast is ruled out
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)

      // row-level equality with the plain join
      val expected = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
