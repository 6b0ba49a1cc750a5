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

  test("native as-of join over bucketed tables plans no Exchange") {
    // the scale claim in AsOfJoinNative's scaladoc, pinned: the exec
    // declares ClusteredDistribution, so bucketed-by-key inputs satisfy
    // it directly and EnsureRequirements inserts NO shuffle on either
    // side — the write-once-join-many trade applied to point-in-time
    // joins (the composed union-window form can never claim this: the
    // union of the two sides always re-shuffles)
    val base = java.nio.file.Files.createTempDirectory("bucketed-asof").toString
    val ev = Queries.events(spark, dir)
    Bucketing.writeBucketed(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value"),
      "clicks_b", "user_id", 8, s"$base/clicks_b")
    Bucketing.writeBucketed(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
        .groupBy("user_id", "ts")
        .agg(org.apache.spark.sql.functions.max("value").as("err_value")),
      "errors_b", "user_id", 8, s"$base/errors_b")
    try {
      val joined = graft.plans.AsOfJoinNative.asOf(
        spark.table("clicks_b"), spark.table("errors_b"), key = "user_id", time = "ts")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("GraftAsOfJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // result parity with the unbucketed composed form
      val expected = AsOfJoin.asOf(
        ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
          .groupBy("user_id", "ts")
          .agg(org.apache.spark.sql.functions.max("value").as("err_value")),
        "user_id", "ts")
        .select("event_id", "__asof_time", "err_value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      val got = joined.select("event_id", "__asof_time", "err_value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS clicks_b")
      spark.sql("DROP TABLE IF EXISTS errors_b")
    }
  }
}
