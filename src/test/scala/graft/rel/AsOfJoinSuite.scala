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

  test("native as-of: tolerance boundary — exactly-tol matches, tol+1 does not") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "exact"),   // right at 90, gap 10 == tol -> match
      (2L, 100L, "beyond"),  // right at 89, gap 11 > tol -> null
      (3L, 100L, "zero-gap") // right at 100, gap 0 -> match
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r1"), (2L, 89L, "r2"), (3L, 100L, "r3")).toDF("k", "t", "rv")
    val got = graft.plans.AsOfJoinNative
      .asOf(left, right, "k", "t", tolerance = Some(10L))
      .select("tag", "rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("exact").contains("r1"))
    assert(got("beyond").isEmpty)
    assert(got("zero-gap").contains("r3"))
    // backward never matches future rows regardless of tolerance
    val l2 = Seq((1L, 50L)).toDF("k", "t")
    val r2 = Seq((1L, 51L, "future")).toDF("k", "t", "rv")
    assert(graft.plans.AsOfJoinNative.asOf(l2, r2, "k", "t", tolerance = Some(1000L))
      .select("rv").first().isNullAt(0))
  }

  test("native as-of: forward direction picks the earliest at-or-after row") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "tie"),      // right AT 10 matches (>=)
      (1L, 11L, "between"),  // earliest right >= 11 is 15
      (1L, 16L, "after-all"),// no right >= 16 -> null
      (2L, 1L, "no-key")
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15")).toDF("k", "t", "rv")
    val got = graft.plans.AsOfJoinNative
      .asOf(left, right, "k", "t", direction = "forward")
      .select("tag", "__asof_time", "rv").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.toString), Option(r.getString(2)))))
      .toMap
    assert(got("tie") == ((Some("10"), Some("r10"))))
    assert(got("between") == ((Some("15"), Some("r15"))))
    assert(got("after-all") == ((None, None)))
    assert(got("no-key") == ((None, None)))
    // forward tolerance boundary
    val l2 = Seq((1L, 10L, "in"), (2L, 10L, "out")).toDF("k", "t", "tag")
    val r2 = Seq((1L, 15L, "a"), (2L, 16L, "b")).toDF("k", "t", "rv")
    val tolGot = graft.plans.AsOfJoinNative
      .asOf(l2, r2, "k", "t", direction = "forward", tolerance = Some(5L))
      .select("tag", "rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(tolGot("in").contains("a") && tolGot("out").isEmpty)
    // forward (key, time) ties resolve to the payload-max, like backward
    val l3 = Seq((1L, 5L)).toDF("k", "t")
    val r3 = Seq((1L, 9L, "low"), (1L, 9L, "zzz")).toDF("k", "t", "rv")
    assert(graft.plans.AsOfJoinNative.asOf(l3, r3, "k", "t", direction = "forward")
      .select("rv").first().getString(0) == "zzz")
  }

  test("native as-of forward/tolerance == brute force on a randomized dense fixture") {
    import spark.implicits._
    var seed = 98765L
    def next(mod: Int): Int = { seed = (seed * 6364136223846793005L + 1442695040888963407L); ((seed >>> 33) % mod).toInt }
    val leftRows = (0 until 500).map(i => ((next(7)).toLong, next(60).toLong, i.toLong))
    val rightRaw = (0 until 300).map(i => ((next(9)).toLong, next(60).toLong, i.toLong))
    // unique (k, t) with max payload — the shared well-defined answer
    val rightRows = rightRaw.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
      (k, t, g.map(_._3).max)
    }.toSeq
    val left = leftRows.toDF("k", "t", "lid")
    val rightU = rightRows.toDF("k", "t", "rv")
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(7L), Some(0L))) {
      val dir = if (fwd) "forward" else "backward"
      val expected = leftRows.map { case (k, t, lid) =>
        val cands = rightRows.filter(r => r._1 == k &&
          (if (fwd) r._2 >= t else r._2 <= t) &&
          tol.forall(x => math.abs(r._2 - t) <= x))
        if (cands.isEmpty) (lid, None, None)
        else {
          val m = if (fwd) cands.minBy(_._2) else cands.maxBy(_._2)
          (lid, Some(m._2: Any), Some(m._3: Any))
        }
      }.toSet
      // BOTH execution tiers — the shuffle merge and the broadcast
      // binary search — against the same brute-force answer
      for (variant <- Seq("merge", "broadcast")) {
        val df =
          if (variant == "merge")
            graft.plans.AsOfJoinNative.asOf(left, rightU, "k", "t", dir, tol)
          else
            graft.plans.AsOfJoinNative.asOfBroadcast(left, rightU, "k", "t", dir, tol)
        val got = df.select("lid", "__asof_time", "rv").collect()
          .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
        assert(got == expected, s"dir=$dir tol=$tol variant=$variant")
        assert(got.exists(_._2.nonEmpty) && got.exists(_._2.isEmpty),
          s"degenerate dir=$dir tol=$tol variant=$variant")
      }
    }
  }

  test("broadcast as-of: null keys/times and string keys behave like the merge") {
    import spark.implicits._
    val l3 = Seq((Some(1L), Some(12L), "ok"), (None, Some(12L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "tag")
    val r3 = Seq((Some(1L), Some(10L), "r10"), (None, Some(1L), "rnull"))
      .toDF("k", "t", "rv")
    val m3 = graft.plans.AsOfJoinNative.asOfBroadcast(l3, r3, "k", "t")
      .select("tag", "rv").collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m3("ok").contains("r10") && m3("nullkey").isEmpty && m3("nulltime").isEmpty)
    val l4 = (0 until 200).map(i => (s"key-${i % 29}", (i / 29).toLong * 2 + 1, i.toLong))
      .toDF("k", "t", "lid")
    val r4 = (0 until 200).map(i => (s"key-${i % 23}", (i / 23).toLong * 2, i.toLong))
      .toDF("k", "t", "rv")
    val r4U = r4.groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rv").as("rv"))
    val a = AsOfJoin.asOf(l4, r4U, "k", "t")
      .select("lid", "__asof_time", "rv").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val b = graft.plans.AsOfJoinNative.asOfBroadcast(l4, r4U, "k", "t")
      .select("lid", "__asof_time", "rv").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(a == b)
  }

  test("composite keys work through struct packing on both exec tiers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct}
    // (symbol, exchange) composite key packed into ONE struct column —
    // the documented multi-key recipe: struct ordering drives both the
    // clustering and the merge/bucket comparisons
    val left = Seq(
      ("A", 1L, 10L, "a1-t10"),
      ("A", 2L, 10L, "a2-t10"), // same symbol, different exchange
      ("B", 1L, 10L, "b1-t10")
    ).toDF("sym", "exch", "t", "tag")
      .select(struct(col("sym"), col("exch")).as("k"), col("t"), col("tag"))
    val right = Seq(
      ("A", 1L, 5L, "rA1"),
      ("A", 2L, 7L, "rA2"),
      ("B", 2L, 3L, "rB2-wrong-exch")
    ).toDF("sym", "exch", "t", "rv")
      .select(struct(col("sym"), col("exch")).as("k"), col("t"), col("rv"))
    for (variant <- Seq("merge", "broadcast")) {
      val df =
        if (variant == "merge") graft.plans.AsOfJoinNative.asOf(left, right, "k", "t")
        else graft.plans.AsOfJoinNative.asOfBroadcast(left, right, "k", "t")
      val got = df.select("tag", "rv").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(got("a1-t10").contains("rA1"), s"$variant: $got")
      assert(got("a2-t10").contains("rA2"), s"$variant: $got")
      assert(got("b1-t10").isEmpty, s"$variant: $got") // B/1 has no match (B/2 does not count)
    }
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
