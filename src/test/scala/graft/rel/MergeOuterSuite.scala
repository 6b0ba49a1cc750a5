package graft.rel

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the full-outer join (q92) and the CDC merge (q93) on
  * sf0.001 — both are oracle-gated by the driver; these pin the outer
  * null-padding and the merge op precedence against driver-side models.
  */
class MergeOuterSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q151 FK audit: clean on the generator, and the detector actually fires on corruption") {
    import spark.implicits._
    val clean = Queries.q151FkAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(clean.length == 7)
    assert(clean.forall(_._3 == 0L), s"generator data should audit clean: ${clean.toSeq}")
    // corrupt a copy: point 5 orders at a customer key that cannot exist
    val tmp = java.nio.file.Files.createTempDirectory("fkaudit").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "lineitem"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$tmp/$t.parquet"))
    Queries.table(spark, dir, "orders")
      .withColumn(
        "o_custkey",
        org.apache.spark.sql.functions.when(col("o_orderkey") % 97 === 0,
          org.apache.spark.sql.functions.lit(-999L)).otherwise(col("o_custkey")))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val audited = Queries.q151FkAudit(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(audited("orders.o_custkey->customer") > 0, "corruption not detected")
    // the unrelated edges still audit clean
    assert(audited("customer.c_nationkey->nation") == 0L)
    assert(audited("nation.n_regionkey->region") == 0L)
  }

  test("q152 incremental agg: merge path == full recompute, delta genuinely contributes") {
    import spark.implicits._
    val full = Queries.table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum(col("o_totalprice")), 2).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val merged = Queries.q152IncrementalAgg(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged == full)
    // the delta side is non-empty, so the merge path was exercised
    val nDelta = Queries.table(spark, dir, "orders")
      .filter(col("o_orderkey") % Queries.AggDeltaMod === 0).count()
    assert(nDelta > 0)
  }

  test("full outer join: both sides contribute unmatched null-padded rows") {
    val rows = Queries.q92FullOuterJoin(spark, dir).collect()
    val leftOnly = rows.count(r => !r.isNullAt(1) && r.isNullAt(3))
    val rightOnly = rows.count(r => r.isNullAt(1) && !r.isNullAt(3))
    val both = rows.count(r => !r.isNullAt(1) && !r.isNullAt(3))
    assert(leftOnly > 0 && rightOnly > 0 && both > 0)
    assert(rows.forall(!_.isNullAt(0))) // coalesced key never null
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("merge upsert: deletes gone, updates re-priced, inserts present, rest untouched") {
    import spark.implicits._
    val base = Queries.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].collect().toMap
    val maxKey = base.keys.max
    val got = Queries.q93MergeUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    base.foreach { case (k, price) =>
      if (k % 13 == 0) assert(!got.contains(k), s"delete $k survived")
      else if (k % 7 == 0) assert(got(k) == price * 2, s"update $k")
      else assert(got(k) == price, s"untouched $k changed")
    }
    val inserts = base.keys.filter(_ % 101 == 0).map(_ + maxKey + 1).toSet
    assert(inserts.nonEmpty && inserts.forall(k => got(k) == 100.0))
    assert(got.size == base.size - base.keys.count(_ % 13 == 0) + inserts.size)
  }

  test("q166 approx stats: NDVs within 5% of exact; every other metric identical") {
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val exact = asMap(Queries.q164TableStats(spark, dir))
    val approx = asMap(Queries.q166TableStatsApprox(spark, dir))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nRows, nNulls, ndv, mn, mx)) =>
      val (aRows, aNulls, aNdv, aMn, aMx) = approx(c)
      // only the NDV is sketched; the rest must be bit-identical
      assert((aRows, aNulls, aMn, aMx) == ((nRows, nNulls, mn, mx)), c)
      assert(math.abs(aNdv - ndv) <= math.max(1L, (ndv * 0.05).toLong),
        s"$c: approx NDV $aNdv vs exact $ndv")
    }
  }
}
