package graft.rel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of join: ties match, gaps carry forward, no-match yields null") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "l-before-any"), // before any right row -> null
      (1L, 10L, "l-tie"),       // right row AT 10 matches (<=)
      (1L, 17L, "l-between"),   // latest right <= 17 is t=15
      (2L, 100L, "l-other-key") // key 2 has no right rows -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "r10"),
      (1L, 15L, "r15"),
      (3L, 1L, "r-unused-key")
    ).toDF("k", "t", "rv")

    val got = AsOfJoin.asOf(left, right, key = "k", time = "t")
      .select("k", "t", "tag", "__asof_time", "rv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), Option(r.get(3)).map(_.toString), Option(r.getString(4)))))
      .toMap

    assert(got((1L, 5L)) == (("l-before-any", None, None)))
    assert(got((1L, 10L)) == (("l-tie", Some("10"), Some("r10"))))
    assert(got((1L, 17L)) == (("l-between", Some("15"), Some("r15"))))
    assert(got((2L, 100L)) == (("l-other-key", None, None)))
  }

  test("as-of join preserves null payload fields inside a matched row") {
    import spark.implicits._
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, Some("early")), (1L, 15L, None: Option[String]))
      .toDF("k", "t", "rv")
    // latest match (t=15) has rv=NULL; a per-column last(ignoreNulls) would
    // wrongly resurrect "early" — the struct payload must keep the null
    val r = AsOfJoin.asOf(left, right, "k", "t").select("__asof_time", "rv").first()
    assert(r.getLong(0) == 15L && r.isNullAt(1))
  }
}
