package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DotF64Suite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dot_f64 matches the higher-order-function formulation exactly") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, -1.5), Array(2.0, 4.0)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      expr("dot_f64(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x)
        .as("hof")
    ).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("dot_f64 is available through spark.sql text and null-safe") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d))").first().getDouble(0) == 11.0)
    assert(spark.sql("SELECT dot_f64(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").first().isNullAt(0))
  }

  test("dot_f64 participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // range source, not a local Seq: ConvertToLocalRelation would fold a
    // literal frame into LocalTableScan and leave nothing to codegen
    val df = spark.range(2)
      .selectExpr("dot_f64(array(cast(id as double), 2.0d), array(3.0d, 4.0d)) as d")
    // "*(n)" marks operators fused into a WholeStageCodegen stage; the
    // Project evaluating dot_f64 must carry it (a codegen-incompatible
    // expression would split the stage)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_f64"), plan)
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(8.0, 11.0))
  }

  test("FuseSelfDot rewrites dot_f64(a, a) to norm_sq_f64 — and ONLY self-dots") {
    GraftFunctions.register(spark)
    val df = spark.range(3)
      .selectExpr("array(cast(id as double), 2.0d) as a", "array(3.0d, 4.0d) as b")
      .selectExpr("dot_f64(a, a) as selfdot", "dot_f64(a, b) as cross")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("norm_sq_f64"), opt)
    // the distinct-argument dot is untouched
    assert(opt.contains("dot_f64"), opt)
    // values are exactly the naive self-dot (same fold order)
    val rows = df.collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i.toDouble * i + 4.0)
      assert(r.getDouble(1) == i.toDouble * 3 + 8.0)
    }
    // the fused expression stays inside whole-stage codegen
    val ep = df.queryExecution.executedPlan.toString
    assert(ep.contains("*(1) Project"), ep)
    // a non-deterministic child must NOT fuse (two draws != one draw squared)
    val nd = spark.range(1)
      .selectExpr("dot_f64(array(rand()), array(rand())) as r")
      .queryExecution.optimizedPlan.toString
    assert(!nd.contains("norm_sq_f64"), nd)
  }
}
