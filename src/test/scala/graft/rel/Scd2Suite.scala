package graft.rel

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the SCD2 layer: interval well-formedness of the batch build
  * (abutting versions, exactly one open row per user, de-noop collapse),
  * and the incremental == batch equivalence across every seam case the
  * delta apply can hit — a delta head repeating the current value,
  * same-timestamp ties, a user new in the delta, a user absent from the
  * delta (pure carry), and the empty delta.
  */
class Scd2Suite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def log(rows: (Long, String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, t, at, id) => (u, t, ts(at), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
  }

  private def collectSet(df: DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("fromChangeLog: de-noop, abutting intervals, exactly one open row per user") {
    val history = Scd2.fromChangeLog(log(
      (1L, "a", "2024-01-01 00:00:00", 1L),
      (1L, "a", "2024-01-02 00:00:00", 2L), // no-op: collapses
      (1L, "b", "2024-01-03 00:00:00", 3L),
      (1L, "a", "2024-01-04 00:00:00", 4L),
      (2L, "x", "2024-01-01 12:00:00", 5L)))
    val rows = history.orderBy("user_id", "valid_from").collect()
    assert(rows.length == 4) // the no-op vanished
    val u1 = rows.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    // versions abut: valid_to(i) == valid_from(i+1)
    u1.sliding(2).foreach { w =>
      assert(w(0).getTimestamp(3) == w(1).getTimestamp(2))
    }
    // exactly one open row per user, and it is the last
    Seq(1L, 2L).foreach { u =>
      val open = rows.filter(r => r.getLong(0) == u && r.getBoolean(4))
      assert(open.length == 1 && open.head.getTimestamp(3) == null)
    }
  }

  test("same-timestamp ties break by event_id on both the de-noop and the intervals") {
    val history = Scd2.fromChangeLog(log(
      (1L, "a", "2024-01-01 00:00:00", 10L),
      (1L, "b", "2024-01-02 00:00:00", 20L),
      (1L, "c", "2024-01-02 00:00:00", 21L))) // same ts, later id → wins
    val segs = history.orderBy("valid_from", "seg").collect().map(_.getString(1))
    assert(segs.toSeq == Seq("a", "b", "c"))
    val current = history.filter(col("is_current")).collect()
    assert(current.length == 1 && current.head.getString(1) == "c")
  }

  test("applyDelta == batch across every seam case") {
    val baseLog = log(
      (1L, "a", "2024-01-01 00:00:00", 1L),
      (1L, "b", "2024-01-03 00:00:00", 2L), // user 1: open row 'b'
      (2L, "x", "2024-01-02 00:00:00", 3L), // user 2: no delta rows (carry)
      (3L, "m", "2024-01-04 00:00:00", 4L)) // user 3: delta repeats 'm'
    val deltaLog = log(
      (1L, "c", "2024-01-10 00:00:00", 10L), // plain change
      (3L, "m", "2024-01-11 00:00:00", 11L), // no-op at the seam: must collapse
      (3L, "n", "2024-01-12 00:00:00", 12L),
      (4L, "z", "2024-01-13 00:00:00", 13L), // user new in the delta
      (4L, "z", "2024-01-13 00:00:00", 14L)) // tie + no-op inside the delta
    val incremental = Scd2.applyDelta(Scd2.fromChangeLog(baseLog), deltaLog)
    val batch = Scd2.fromChangeLog(baseLog.unionByName(deltaLog))
    assert(collectSet(incremental) == collectSet(batch))
    // the seam no-op really collapsed: user 3 has exactly two versions
    assert(incremental.filter(col("user_id") === 3L).count() == 2)
    // closed rows of touched users carried verbatim
    val closedBefore = collectSet(Scd2.fromChangeLog(baseLog).filter(!col("is_current")))
    val closedAfter = collectSet(incremental.filter(!col("is_current")))
    assert(closedBefore.subsetOf(closedAfter))
  }

  test("retro-dated delta event raises instead of silently diverging") {
    val base = Scd2.fromChangeLog(log(
      (1L, "a", "2024-01-01 00:00:00", 1L),
      (1L, "b", "2024-01-03 00:00:00", 2L))) // open row valid_from 01-03
    val retro = log((1L, "c", "2024-01-02 00:00:00", 10L)) // before 01-03
    val e = intercept[Exception] {
      Scd2.applyDelta(base, retro).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("retro-dated"),
      s"expected the retro-dated guard to fire, got: ${e.getMessage}")
    // the guard is inert on a compliant delta (same user, ts at the seam)
    val ok = Scd2.applyDelta(base, log((1L, "c", "2024-01-03 00:00:00", 10L)))
    assert(ok.count() == 3)
    // a delta row carrying the reserved seed id is rejected, not allowed
    // to poison seed detection or the seed-sorts-first tie-break
    val e2 = intercept[Exception] {
      Scd2.applyDelta(base, log(
        (1L, "c", "2024-01-10 00:00:00", -1L),
        (1L, "d", "2024-01-05 00:00:00", 5L))).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("negative event_id"),
      s"expected the negative-id guard, got: ${e2.getMessage}")
    // a NULL delta id is rejected too (asc-nulls-first would displace
    // the seed as chain head and silently diverge)
    import spark.implicits._
    val nullId = Seq((1L, "c", ts("2024-01-03 00:00:00"), None: Option[Long]))
      .toDF("user_id", "event_type", "ts", "event_id")
    val e3 = intercept[Exception] {
      Scd2.applyDelta(base, nullId).collect()
    }
    assert(e3.getMessage != null && e3.getMessage.contains("negative event_id"),
      s"expected the null-id guard, got: ${e3.getMessage}")
  }

  test("empty delta: history unchanged") {
    val baseLog = log(
      (1L, "a", "2024-01-01 00:00:00", 1L),
      (1L, "b", "2024-01-03 00:00:00", 2L))
    val base = Scd2.fromChangeLog(baseLog)
    val out = Scd2.applyDelta(base, log())
    assert(collectSet(out) == collectSet(base))
  }

  test("point-in-time enrichment (q188 shape): every fact matches, fact side has no shuffle") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val out = Queries.q188Scd2AsOfEnrich(spark, dir)
    assert(out.filter(col("seg").isNull).count() == 0L,
      "every event's own change chain is <= its ts, so every fact must match")
    // a change event's at-time segment is itself
    val sample = out.filter(col("ts") === col("seg_since")).limit(50).collect()
    sample.foreach(r => assert(r.getAs[String]("seg") == r.getAs[String]("event_type")))
    // broadcast tier: the fact side must keep its scan partitioning —
    // the only Exchange in the whole plan is the BroadcastExchange (the
    // final orderBy adds a range Exchange, so pin the pre-sort child)
    val dim = Scd2.fromChangeLog(ev)
      .select(col("user_id"), col("valid_from").as("t"), col("seg"))
    val facts = ev.select(col("event_id"), col("user_id"), col("ts").as("t"))
    val plan = graft.plans.AsOfJoinNative.asOfBroadcast(facts, dim, "user_id", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("ShuffleExchange") || {
      // any shuffle present must sit under the DIM subtree (the SCD2
      // window build), never on the fact scan path
      val factSide = plan.substring(plan.indexOf("AsOfJoinBroadcast"))
      !factSide.split("BroadcastExchange").head.contains("ShuffleExchange")
    }, s"fact side must not shuffle:\n$plan")
  }

  test("time-in-state conserves time: per-user durations sum to cap − first change") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val cap = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val perUser = Scd2.fromChangeLog(ev)
      .withColumn("dur_us",
        unix_micros(coalesce(col("valid_to"), lit(cap))) - unix_micros(col("valid_from")))
      .groupBy("user_id")
      .agg(sum("dur_us").as("total"), min(unix_micros(col("valid_from"))).as("first_us"))
      .collect()
    val capUs = cap.getTime * 1000L + (cap.getNanos / 1000L) % 1000L
    perUser.foreach { r =>
      assert(r.getAs[Long]("total") == capUs - r.getAs[Long]("first_us"),
        s"user ${r.get(0)}: intervals must tile [first change, cap] exactly")
    }
  }

  test("events table: incremental at an arbitrary cutoff == full-log batch") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val cut = to_timestamp(lit("2024-01-11 00:00:00")) // NOT q186's cutoff
    val incremental = Scd2.applyDelta(
      Scd2.fromChangeLog(ev.filter(col("ts") < cut)),
      ev.filter(col("ts") >= cut))
    val batch = Scd2.fromChangeLog(ev)
    assert(collectSet(incremental) == collectSet(batch))
    // exactly one open row per user in the final history
    val opens = incremental.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1L).count()
    assert(opens == 0L)
  }
}
