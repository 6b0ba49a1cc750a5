package graft.rel

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for hidden partitioning: the derived partition predicate really
  * reaches the scan (PartitionFilters in the plan text, scanned files
  * confined to the derived directories), the derivations are sound
  * (result equality with the unpartitioned filter, including rows at
  * the day boundaries), and the bucket probe uses the writer's own hash
  * (round-trip: every key's rows land in the bucket the reader derives).
  */
class HiddenPartitioningSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The files the scan will ACTUALLY read after partition pruning —
    * df.inputFiles ignores partition filters (it lists the relation),
    * so ask the scan node's FileIndex with the scan's own filters.
    */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
  }

  private def sample() = {
    import spark.implicits._
    // 20 days × 50 rows, including rows exactly at midnight boundaries
    (0 until 1000).map { i =>
      val day = i / 50
      val sec = (i % 50) * 1727 % 86400
      (i.toLong, Timestamp.valueOf(f"2024-02-${day + 1}%02d " +
        f"${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d"), i.toLong % 37)
    }.toDF("id", "ts", "key")
  }

  test("day transform: derived partition filter prunes directories; rows == plain filter") {
    val dir = Files.createTempDirectory("hp-suite-").toString + "/t"
    val df = sample()
    HiddenPartitioning.writeDayPartitioned(df, "ts", dir)
    val (lo, hi) = ("2024-02-05 00:00:00", "2024-02-08 00:00:00")
    val out = HiddenPartitioning.readTsRange(spark, dir, "ts", lo, hi)
    // only the 4 derived day directories are ever touched (Feb 5,6,7 +
    // the hi boundary day 8, which the residual then empties)
    val days = scannedFiles(out).map(f =>
      f.split("__p_day=")(1).split("/")(0)).toSet
    assert(days.subsetOf(Set("2024-02-05", "2024-02-06", "2024-02-07", "2024-02-08")),
      s"scanned days: $days")
    assert(days.contains("2024-02-05") && days.contains("2024-02-07"))
    val expected = df.filter(col("ts") >= ts(lo) && col("ts") < ts(hi))
      .collect().map(_.toSeq).toSet
    assert(out.select("id", "ts", "key").collect()
      .map(_.toSeq).toSet == expected)
    // the partition predicate is a PartitionFilter, not a post-scan one
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(HiddenPartitioning.DayCol), plan)
  }

  test("day bounds derive under the WRITER's recorded zone, not the reader's session zone") {
    // writer session in Los Angeles: an instant at 02:00 UTC on Feb 5
    // is still Feb 4 locally, so it is minted into __p_day=2024-02-04.
    val writer = spark.newSession()
    writer.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    val reader = spark.newSession()
    reader.conf.set("spark.sql.session.timeZone", "UTC")
    val dir = Files.createTempDirectory("hp-zone-").toString + "/t"
    import writer.implicits._
    val row = Seq((1L, Timestamp.from(
      java.time.Instant.parse("2024-02-05T02:00:00Z")))).toDF("id", "ts")
    HiddenPartitioning.writeDayPartitioned(row, "ts", dir)
    assert(Files.exists(java.nio.file.Paths.get(dir, HiddenPartitioning.ZoneMetaFile)))
    // UTC reader asks for [Feb 5 00:00, Feb 5 06:00) UTC. A reader-zone
    // derivation would prune to day 2024-02-05 only and silently lose
    // the row (it lives in 2024-02-04); the writer-zone derivation must
    // keep it.
    val out = HiddenPartitioning.readTsRange(
      reader, dir, "ts", "2024-02-05 00:00:00", "2024-02-05 06:00:00")
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L),
      "cross-zone read lost the row the residual filter matches")
  }

  test("day transform: midnight boundary rows are kept (lo) and excluded (hi) correctly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hp-suite-").toString + "/t"
    val df = Seq(
      (1L, ts("2024-02-05 00:00:00"), 0L), // exactly lo → in
      (2L, ts("2024-02-08 00:00:00"), 0L), // exactly hi → out
      (3L, ts("2024-02-07 23:59:59"), 0L)  // last second → in
    ).toDF("id", "ts", "key")
    HiddenPartitioning.writeDayPartitioned(df, "ts", dir)
    val got = HiddenPartitioning.readTsRange(spark, dir, "ts",
      "2024-02-05 00:00:00", "2024-02-08 00:00:00")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("bucket transform: probe lists exactly one bucket directory; rows == plain filter") {
    val dir = Files.createTempDirectory("hp-suite-").toString + "/t"
    val df = sample()
    HiddenPartitioning.writeBucketed(df, "key", 8, dir)
    (0L until 37L by 5L).foreach { k =>
      val out = HiddenPartitioning.readKeyEquals(spark, dir, "key", k, 8)
      val buckets = scannedFiles(out).map(f =>
        f.split("__p_bucket=")(1).split("/")(0)).toSet
      assert(buckets.size <= 1, s"probe k=$k must touch one bucket, got $buckets")
      val expected = df.filter(col("key") === k).collect()
        .map(_.toSeq).toSet
      assert(out.select("id", "ts", "key").collect()
        .map(_.toSeq).toSet == expected, s"k=$k")
    }
  }

  test("bucket probe of an absent key: empty result, still at most one directory listed") {
    val dir = Files.createTempDirectory("hp-suite-").toString + "/t"
    HiddenPartitioning.writeBucketed(sample(), "key", 8, dir)
    val out = HiddenPartitioning.readKeyEquals(spark, dir, "key", 424242L, 8)
    assert(out.count() == 0L)
  }

  test("partition evolution day->hour: both eras prune to derived dirs; union == plain filter; boundary invisible") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = java.nio.file.Files.createTempDirectory("hp-evolve-").toString + "/t"
    val df = sample() // 2024-02-01 .. 2024-02-20
    val boundary = "2024-02-11 00:00:00"
    HiddenPartitioning.initEvolvable(
      df.filter(col("ts") < lit(boundary).cast("timestamp")), "ts", root)
    HiddenPartitioning.evolveToHourly(spark, root)
    // evolve is metadata-only: the new era has NO directory yet, and a
    // range read between the evolve and the first append must serve
    // the old eras, not crash on the missing path
    assert(HiddenPartitioning.readTsRangeEvolved(spark, root, "ts",
      "2024-02-01 00:00:00", "2024-02-28 00:00:00").count() ==
      df.filter(col("ts") < lit(boundary).cast("timestamp")).count())
    HiddenPartitioning.appendEvolvable(
      df.filter(col("ts") >= lit(boundary).cast("timestamp")), "ts", root)
    // era layout on disk: e0 day dirs only below the boundary, e1 hour
    // dirs only at/above it
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(root, "e0"))
      .filter(_.getFileName.toString.startsWith("__p_day="))
      .count() == 10)
    val (lo, hi) = ("2024-02-09 05:30:00", "2024-02-13 17:45:00")
    val out = HiddenPartitioning.readTsRangeEvolved(spark, root, "ts", lo, hi)
    // result == the plain residual filter over ALL rows — the era
    // boundary and both transforms are invisible to results
    val want = df.filter(col("ts") >= lit(lo).cast("timestamp") &&
      col("ts") < lit(hi).cast("timestamp"))
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet == want)
    assert(want.nonEmpty)
    // BOTH eras' scans list ONLY derived directories: e0 days 09..11
    // (hi's day, conservatively) and e1 hours 11th-00h .. 13th-17h
    val scans = out.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 2, s"one scan per era: ${scans.size}")
    val byEra = scans.map { s =>
      val fs = s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files.map(_.getPath.toString))
      (if (fs.exists(_.contains("/e0/"))) "e0" else "e1", fs)
    }.toMap
    assert(byEra("e0").nonEmpty && byEra("e0").forall { f =>
      Seq("2024-02-09", "2024-02-10", "2024-02-11", "2024-02-12", "2024-02-13")
        .exists(d => f.contains(s"__p_day=$d"))
    }, byEra("e0"))
    assert(byEra("e1").nonEmpty && byEra("e1").forall { f =>
      val h = f.split("__p_hour=")(1).split("/")(0)
      h >= "2024-02-09-05" && h <= "2024-02-13-17"
    }, byEra("e1"))
    // e0 lists no day the derived range excludes
    assert(!byEra("e0").exists(_.contains("__p_day=2024-02-08")))
    // e1 prunes INSIDE a day: the 13th's hours past 17 are excluded
    assert(!byEra("e1").exists(_.contains("__p_hour=2024-02-13-18")))
    // evolve guards: double-evolve rejected; zone-mismatched append rejected
    intercept[IllegalArgumentException](
      HiddenPartitioning.evolveToHourly(spark, root))
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "Australia/Eucla")
    intercept[IllegalArgumentException](
      HiddenPartitioning.appendEvolvable(
        shifted.read.parquet(root + "/e1").drop("__p_hour"), "ts", root))
    // unparseable bound: defined empty, never a crash
    assert(HiddenPartitioning.readTsRangeEvolved(
      spark, root, "ts", "not-a-time", hi).count() == 0L)
  }

  test("bucket-count evolution 4->8: one directory listed per era; union == plain equality filter") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("hp-bevolve-").toString + "/t"
    val df = sample()
    HiddenPartitioning.initEvolvableBucketed(df.filter(col("id") < 500), "key", 4, root)
    HiddenPartitioning.evolveBucketCount(spark, root, 8)
    // metadata-only: probes keep working before the first 8-bucket append
    val preAppend = HiddenPartitioning.readKeyEqualsEvolved(spark, root, "key", 7L)
    assert(preAppend.collect().map(_.getLong(0)).toSet ==
      df.filter(col("id") < 500 && col("key") === 7L)
        .collect().map(_.getLong(0)).toSet)
    HiddenPartitioning.appendEvolvableBucketed(df.filter(col("id") >= 500), "key", root)
    val out = HiddenPartitioning.readKeyEqualsEvolved(spark, root, "key", 7L)
    val want = df.filter(col("key") === 7L).collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet == want && want.nonEmpty)
    // exactly ONE bucket directory listed per era
    val scans = out.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 2)
    scans.foreach { s =>
      val dirs = s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files.map(_.getPath.toString))
        .map(_.split("/__p_bucket=")(1).split("/")(0)).toSet
      assert(dirs.size == 1, s"probe must list one bucket dir per era: $dirs")
    }
    // same-count "evolution" is rejected
    intercept[IllegalArgumentException](
      HiddenPartitioning.evolveBucketCount(spark, root, 8))
  }
}
