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

  test("native as-of exec: same fixtures as the composed form, plus null keys") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "l-before-any"),
      (1L, 10L, "l-tie"),
      (1L, 17L, "l-between"),
      (2L, 100L, "l-other-key")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "r10"),
      (1L, 15L, "r15"),
      (3L, 1L, "r-unused-key")
    ).toDF("k", "t", "rv")
    val got = graft.plans.AsOfJoinNative.asOf(left, right, key = "k", time = "t")
      .select("k", "t", "tag", "__asof_time", "rv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), Option(r.get(3)).map(_.toString), Option(r.getString(4)))))
      .toMap
    assert(got((1L, 5L)) == (("l-before-any", None, None)))
    assert(got((1L, 10L)) == (("l-tie", Some("10"), Some("r10"))))
    assert(got((1L, 17L)) == (("l-between", Some("15"), Some("r15"))))
    assert(got((2L, 100L)) == (("l-other-key", None, None)))
    // matched-row null payload preserved (the suite's second fixture)
    val l2 = Seq((1L, 20L)).toDF("k", "t")
    val r2 = Seq((1L, 10L, Some("early")), (1L, 15L, None: Option[String]))
      .toDF("k", "t", "rv")
    val row = graft.plans.AsOfJoinNative.asOf(l2, r2, "k", "t")
      .select("__asof_time", "rv").first()
    assert(row.getLong(0) == 15L && row.isNullAt(1))
    // null left keys and times never match; null right keys are skipped
    val l3 = Seq((Some(1L), Some(12L), "ok"), (None, Some(12L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "tag")
    val r3 = Seq((Some(1L), Some(10L), "r10"), (None, Some(1L), "rnull"))
      .toDF("k", "t", "rv")
    val m3 = graft.plans.AsOfJoinNative.asOf(l3, r3, "k", "t")
      .select("tag", "rv").collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m3("ok").contains("r10") && m3("nullkey").isEmpty && m3("nulltime").isEmpty)
  }

  test("native as-of: string keys survive the sorter's buffer reuse") {
    import spark.implicits._
    // regression for the retained-matchKey hazard: with a non-primitive
    // key type the extracted key must be re-read from the COPIED row, not
    // the sorter's reused buffer — otherwise advancing the right iterator
    // silently mutates the retained key and the match check misfires.
    // Many keys + many rows per key force real iterator advancement
    // between the match capture and its use.
    val left = (0 until 400).map { i =>
      (s"key-${i % 29}", (i / 29).toLong * 2 + 1, i.toLong)
    }.toDF("k", "t", "lid")
    val right = (0 until 400).map { i =>
      (s"key-${i % 23}", (i / 23).toLong * 2, i.toLong)
    }.toDF("k", "t", "rv")
    val rightU = right.groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rv").as("rv"))
    val a = AsOfJoin.asOf(left, rightU, "k", "t")
      .select("lid", "__asof_time", "rv").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val b = graft.plans.AsOfJoinNative.asOf(left, rightU, "k", "t")
      .select("lid", "__asof_time", "rv").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(a == b)
    assert(b.exists(_._2.nonEmpty) && b.exists(_._2.isEmpty))
  }

  test("native as-of == composed window form on a randomized dense fixture") {
    import spark.implicits._
    // deterministic LCG fixture: many keys, duplicate times, sparse matches
    var seed = 12345L
    def next(mod: Int): Int = { seed = (seed * 6364136223846793005L + 1442695040888963407L); ((seed >>> 33) % mod).toInt }
    val left = (0 until 500).map(i => ((next(7)).toLong, next(50).toLong, i.toLong)).toDF("k", "t", "lid")
    val right = (0 until 300).map(i => ((next(9)).toLong, next(50).toLong, i.toLong)).toDF("k", "t", "rv")
    // pre-aggregate right to unique (k, t) — both implementations then
    // share a single well-defined answer (max rv per (k, t))
    val rightU = right.groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rv").as("rv"))
    val a = AsOfJoin.asOf(left, rightU, "k", "t")
      .select("k", "t", "lid", "__asof_time", "rv").collect()
      .map(r => (r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toSet
    val b = graft.plans.AsOfJoinNative.asOf(left, rightU, "k", "t")
      .select("k", "t", "lid", "__asof_time", "rv").collect()
      .map(r => (r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(a == b)
    assert(a.exists(_._2.nonEmpty) && a.exists(_._2.isEmpty)) // non-degenerate
  }
}
