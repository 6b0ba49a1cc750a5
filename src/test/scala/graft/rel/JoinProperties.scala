package graft.rel

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.TestSpark

/** Randomized models for the composed join operators: as-of join and
  * binned range join must equal their brute-force definitions on
  * arbitrary inputs (duplicate times, empty sides, boundary values).
  */
object JoinProperties extends Properties("Joins") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val key = Gen.choose(1L, 4L)
  private val time = Gen.choose(0L, 100L)

  property("asOf == per-row max(right.time <= left.time) model") = {
    val leftGen = Gen.listOf(Gen.zip(key, time))
    val rightGen = Gen.nonEmptyListOf(Gen.zip(key, time))
    forAll(leftGen, rightGen) { (ls, rs) =>
      import spark.implicits._
      // de-dup right (k,t) — the match payload must be deterministic
      val rsd = rs.distinct
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rsd.map { case (k, t) => (k, t, s"r$k-$t") }.toDF("k", "t", "rv")
      val got = AsOfJoin.asOf(left, right, "k", "t")
        .select("lid", "rv").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val model = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rsd.filter { case (rk, rt) => rk == k && rt <= t }
        i.toLong -> (if (cands.isEmpty) None
                     else { val (bk, bt) = cands.maxBy(_._2); Some(s"r$bk-$bt") })
      }.toMap
      got == model
    }
  }

  property("binned range join == theta model for any bin width") = {
    val pointsGen = Gen.listOf(time)
    val intervalGen = Gen.nonEmptyListOf(Gen.zip(time, Gen.choose(0L, 40L)))
    forAll(pointsGen, intervalGen, Gen.choose(1L, 25L)) { (ps, ivs, width) =>
      import spark.implicits._
      val points = ps.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("t", "pid")
      val intervals = ivs.zipWithIndex
        .map { case ((s, len), i) => (i.toLong, s, s + len) }.toDF("iid", "s", "e")
      val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", width)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val model = (for {
        ((s, len), i) <- ivs.zipWithIndex
        (t, j) <- ps.zipWithIndex
        if s <= t && t < s + len
      } yield (i.toLong, j.toLong)).toSet
      got == model
    }
  }
}
