package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of fact rows share one key — the shape that melts one reducer
    val fact = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = Seq((7L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "name")

    val plain = fact.join(dim, "k").select("k", "payload", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8).select("k", "payload", "name")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count())

    // the salted plan joins on (k, __salt): the hot key spreads over 8 sub-keys
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
  }

  test("auto-salt engages on skew and stays out of the way otherwise") {
    import spark.implicits._
    val fact = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = Seq((7L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")

    // hot key (9000 rows) above threshold -> salted plan, same rows
    val salted = Skew.autoSaltedJoin(fact, dim, "k", salts = 8, hotThreshold = 1000)
      .select("k", "payload", "name")
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
    assert(salted.collect().toSet == plain.collect().toSet)

    // threshold above the hot key -> plain join, no salt machinery
    val unsalted = Skew.autoSaltedJoin(fact, dim, "k", salts = 8, hotThreshold = 20000)
      .select("k", "payload", "name")
    assert(!unsalted.queryExecution.executedPlan.toString.contains("__salt"))
    assert(unsalted.collect().toSet == plain.collect().toSet)
  }

  test("AQE OptimizeSkewedJoin engages on the q52-shaped pathological key") {
    // The manual salt (q52) handles skew the operator AUTHOR foresaw;
    // this pins the runtime path for skew nobody salted: Spark's
    // adaptive skew-join (on by default: adaptive.enabled +
    // skewJoin.enabled) must detect the oversized partition after the
    // shuffle and split it. Byte thresholds are scaled down so the toy
    // fact's hot partition is "large" by the same ratios a production
    // partition would be — the MECHANISM under test is identical.
    val ss = spark.newSession()
    assert(ss.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(ss.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val fact = ss.range(200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = ss.range(20000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val j = fact.join(dim, "k").select(col("k"), col("payload"), col("v"))
    // execute j's OWN query execution so AQE finalizes it (count() would
    // plan a separate aggregate execution and leave j's plan un-final).
    // 180000 hot-key matches + 2000 of the id%10==0 keys land under 20000
    assert(j.collect().length == 182000)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"), s"OptimizeSkewedJoin did not engage:\n$p")
  }

  test("key histogram surfaces the hot key") {
    import spark.implicits._
    val fact = spark.range(1000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"))
    val top = Skew.keyHistogram(fact, col("k"), 1).collect()
    assert(top.head.getLong(0) == 7L && top.head.getLong(1) == 900L)
  }
}
