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
}
