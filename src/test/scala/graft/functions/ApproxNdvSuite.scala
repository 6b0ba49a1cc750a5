package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** graft_approx_ndv must be BIT-IDENTICAL to approx_count_distinct — same
  * HLL++ helper, same hash, same bias-corrected estimate — the whole
  * point of the reimplementation is buffer representation, never the
  * result (q166's oracle-facing values must not move).
  */
class ApproxNdvSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(rsd: Double): Unit = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = (1 to 50000).map { i =>
      (if (i % 7 == 0) null else s"s${i % 1234}",
        (i % 997).toLong,
        if (i % 11 == 0) Double.NaN else (i % 313) / 7.0)
    }
    // 8 partitions so partial buffers MERGE (the serialize/deserialize +
    // merge path, not just a single-task update loop)
    val df = rows.toDF("s", "l", "d").repartition(8)
    val got = df.agg(
      GraftFunctions.approxNdv(col("s"), rsd),
      GraftFunctions.approxNdv(col("l"), rsd),
      GraftFunctions.approxNdv(col("d"), rsd)).collect()(0)
    val want = df.agg(
      approx_count_distinct(col("s"), rsd),
      approx_count_distinct(col("l"), rsd),
      approx_count_distinct(col("d"), rsd)).collect()(0)
    assert(got == want, s"rsd=$rsd: got $got want $want")
  }

  test("bit-identical to approx_count_distinct at rsd 0.01 (q166's grade)") {
    check(0.01)
  }

  test("bit-identical at rsd 0.02 (cardinalityApprox's grade)") {
    // rsd 0.02 selects a different HLL++ register count (numWords) than
    // either 0.01 or 0.05 — TextAnalysis.cardinalityApprox runs at this
    // grade, so it gets its own bit-identity pin (ADVICE r17)
    check(0.02)
  }

  test("bit-identical at rsd 0.05 (the default grade)") {
    check(0.05)
  }

  test("usable from SQL text and groupBy aggregation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (1 to 10000).map(i => (i % 5, (i % 321).toLong)).toDF("g", "v")
    df.createOrReplaceTempView("approx_ndv_probe")
    val got = spark.sql(
      "SELECT g, graft_approx_ndv(v, 0.01) AS ndv FROM approx_ndv_probe GROUP BY g ORDER BY g")
      .collect().toSeq
    val want = spark.sql(
      "SELECT g, approx_count_distinct(v, 0.01) AS ndv FROM approx_ndv_probe GROUP BY g ORDER BY g")
      .collect().toSeq
    assert(got == want)
  }
}
