package graft.rel

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for merge-on-read deletes: data-file byte-identity across
  * markDeletes (the whole point — no copy-on-write), reader equality
  * with the filtered full scan, delete-batch composition (overlapping
  * predicates, re-deleting dead rows is a no-op), the zero-Exchange
  * broadcast anti-join plan on the data side, and vacuum folding the
  * vectors into a physical rewrite that reads back identical.
  */
class DeleteVectorsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeTable(dir: String): Unit = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, i % 7, s"p$i")).toDF("id", "bucket", "payload")
      .repartition(6)
      .write.parquet(dir)
  }

  private def fileChecksums(dir: String): Map[String, (Long, Long)] =
    Files.list(Paths.get(dir)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val bytes = Files.readAllBytes(p)
        val crc = new java.util.zip.CRC32()
        crc.update(bytes)
        p.getFileName.toString -> (bytes.length.toLong, crc.getValue)
      }.toMap

  test("markDeletes leaves every data byte in place; reader subtracts exactly the marked rows") {
    val root = Files.createTempDirectory("dv-suite-").toString
    writeTable(s"$root/t")
    val before = fileChecksums(s"$root/t")
    DeleteVectors.markDeletes(spark, s"$root/t", col("bucket") === 3, s"$root/dv")
    assert(fileChecksums(s"$root/t") == before,
      "merge-on-read: a delete must not rewrite any data file")
    val got = DeleteVectors.read(spark, s"$root/t", s"$root/dv")
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = (0L until 2000L).filterNot(_ % 7 == 3).toSet
    assert(got == expected)
  }

  test("batches compose; overlapping and repeated deletes are no-ops") {
    val root = Files.createTempDirectory("dv-suite-").toString
    writeTable(s"$root/t")
    DeleteVectors.markDeletes(spark, s"$root/t", col("bucket") === 3, s"$root/dv")
    DeleteVectors.markDeletes(spark, s"$root/t", col("id") < 100L, s"$root/dv") // overlaps bucket 3
    DeleteVectors.markDeletes(spark, s"$root/t", col("bucket") === 3, s"$root/dv") // pure repeat
    val got = DeleteVectors.read(spark, s"$root/t", s"$root/dv")
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = (100L until 2000L).filterNot(_ % 7 == 3).toSet
    assert(got == expected)
  }

  test("no sidecar yet: read is the plain table") {
    val root = Files.createTempDirectory("dv-suite-").toString
    writeTable(s"$root/t")
    assert(DeleteVectors.read(spark, s"$root/t", s"$root/dv-nonexistent").count() == 2000L)
  }

  test("plan shape: broadcast anti-join, zero Exchange on the data side") {
    val root = Files.createTempDirectory("dv-suite-").toString
    writeTable(s"$root/t")
    DeleteVectors.markDeletes(spark, s"$root/t", col("bucket") === 0, s"$root/dv")
    val plan = DeleteVectors.read(spark, s"$root/t", s"$root/dv")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("ShuffleExchange"),
      s"data side must not shuffle for a merge-on-read scan:\n$plan")
  }

  test("broadcast rail: an over-threshold sidecar demotes the subtract to a shuffled hash anti-join, same answer") {
    val root = Files.createTempDirectory("dv-suite-").toString
    writeTable(s"$root/t")
    // high dead fraction: ~6/7 of the table tombstoned — the regime
    // where an unbounded broadcast would OOM executors at scale
    DeleteVectors.markDeletes(spark, s"$root/t", col("bucket") =!= 0, s"$root/dv")
    val broadcastTier = DeleteVectors.read(spark, s"$root/t", s"$root/dv")
      .select("id").collect().map(_.getLong(0)).toSet
    spark.conf.set("spark.graft.mor.broadcastMaxBytes", "1")
    try {
      val demoted = DeleteVectors.read(spark, s"$root/t", s"$root/dv")
      val plan = demoted.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"rail must demote the sidecar broadcast above the threshold:\n$plan")
      assert(plan.contains("ShuffledHashJoin") && plan.contains("LeftAnti"),
        s"fallback must build the hash on the tombstone side (no sort of the data side):\n$plan")
      assert(demoted.select("id").collect().map(_.getLong(0)).toSet == broadcastTier,
        "the rail changes the physical plan, never the answer")
    } finally spark.conf.unset("spark.graft.mor.broadcastMaxBytes")
  }

  test("upsert: latest-wins across three batches, including tombstones inside the append region") {
    import spark.implicits._
    val root = Files.createTempDirectory("dv-suite-").toString
    (0L until 500L).map(i => (i, s"v0-$i")).toDF("id", "v")
      .repartition(4).write.parquet(s"$root/base")
    val baseBytes = fileChecksums(s"$root/base")
    // batch 1: update ids 0..99
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      (0L until 100L).map(i => (i, s"v1-$i")).toDF("id", "v"), Seq("id"), batchId = 1L)
    // batch 2: update ids 50..149 (50..99 live in the APPEND region) + insert 1000..1009
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      ((50L until 150L) ++ (1000L until 1010L)).map(i => (i, s"v2-$i")).toDF("id", "v"),
      Seq("id"), batchId = 2L)
    // batch 3: re-update one id from each region + one brand-new insert
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      Seq((75L, "v3-75"), (300L, "v3-300"), (2000L, "v3-2000")).toDF("id", "v"), Seq("id"), batchId = 3L)
    assert(fileChecksums(s"$root/base") == baseBytes,
      "upserts must never rewrite a base data file")
    val got = DeleteVectors.readMor(spark, s"$root/base", s"$root/app", s"$root/dv")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (
      (0L until 500L).map(i => i -> s"v0-$i") ++
      (0L until 100L).map(i => i -> s"v1-$i") ++
      ((50L until 150L) ++ (1000L until 1010L)).map(i => i -> s"v2-$i") ++
      Seq(75L -> "v3-75", 300L -> "v3-300", 2000L -> "v3-2000")).toMap // later wins
    assert(got == expected)
    // exactly one live version per key
    assert(got.size == expected.size)
  }

  test("upsert into an empty appends region is a pure insert; readMor without appends is the base") {
    import spark.implicits._
    val root = Files.createTempDirectory("dv-suite-").toString
    (0L until 50L).map(i => (i, s"b$i")).toDF("id", "v")
      .repartition(2).write.parquet(s"$root/base")
    assert(DeleteVectors.readMor(spark, s"$root/base", s"$root/app", s"$root/dv").count() == 50L)
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      Seq((100L, "new")).toDF("id", "v"), Seq("id"), batchId = 1L)
    val got = DeleteVectors.readMor(spark, s"$root/base", s"$root/app", s"$root/dv")
    assert(got.count() == 51L)
    assert(got.filter(col("id") === 100L).collect().head.getString(1) == "new")
  }

  test("changes: per-batch CDF with update pairs, inserts, deletes; pre-images file-pruned") {
    import spark.implicits._
    val root = Files.createTempDirectory("dv-suite-").toString
    (0L until 400L).map(i => (i, s"v0-$i")).toDF("id", "v")
      .repartition(4).write.parquet(s"$root/base")
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      (0L until 50L).map(i => (i, s"v1-$i")).toDF("id", "v"), Seq("id"), batchId = 1L)
    // batch 2: update 25..74 (25..49 pre-images live in the APPEND
    // region as v1), insert 900..904
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      ((25L until 75L) ++ (900L until 905L)).map(i => (i, s"v2-$i")).toDF("id", "v"),
      Seq("id"), batchId = 2L)
    val cdf = DeleteVectors.changes(spark, s"$root/base", s"$root/app", s"$root/dv",
      batchId = 2L, Seq("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val expected: Set[(String, Long, String)] =
      ((25L until 50L).map(i => ("update_pre", i, s"v1-$i")) ++   // batch-1 versions
        (50L until 75L).map(i => ("update_pre", i, s"v0-$i")) ++  // untouched-by-1 versions
        (25L until 75L).map(i => ("update_post", i, s"v2-$i")) ++
        (900L until 905L).map(i => ("insert", i, s"v2-$i"))).toSet
    assert(cdf == expected)
    // batch 1's own feed is unchanged by batch 2 (feeds are per-batch)
    val cdf1 = DeleteVectors.changes(spark, s"$root/base", s"$root/app", s"$root/dv",
      batchId = 1L, Seq("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(cdf1 == ((0L until 50L).map(i => ("update_pre", i, s"v0-$i")) ++
      (0L until 50L).map(i => ("update_post", i, s"v1-$i"))).toSet)
    // pure-delete batch → delete ops with the tombstoned images
    DeleteVectors.markDeletesByKeys(spark, s"$root/base",
      Seq(200L, 201L).toDF("id"), s"$root/dv", batchId = 3L)
    val cdf3 = DeleteVectors.changes(spark, s"$root/base", s"$root/app", s"$root/dv",
      batchId = 3L, Seq("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(cdf3 == Set(("delete", 200L, "v0-200"), ("delete", 201L, "v0-201")))
  }

  test("live-view marking: re-updating a key tombstones only the LIVE version, never twice") {
    import spark.implicits._
    val root = Files.createTempDirectory("dv-suite-").toString
    (0L until 100L).map(i => (i, s"v0-$i")).toDF("id", "v")
      .repartition(2).write.parquet(s"$root/base")
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      Seq((7L, "v1-7")).toDF("id", "v"), Seq("id"), batchId = 1L)
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      Seq((7L, "v2-7")).toDF("id", "v"), Seq("id"), batchId = 2L)
    // the base position for id=7 must be tombstoned exactly once (by
    // batch 1); batch 2 tombstones only the batch-1 append row
    val dv = spark.read.parquet(s"$root/dv")
    assert(dv.count() == 2L)
    assert(dv.groupBy("__dv_file", "__dv_pos").count()
      .filter(col("count") > 1L).count() == 0L,
      "a position must never be tombstoned twice")
    // and batch 2's pre-image is therefore exactly the batch-1 version
    val cdf2 = DeleteVectors.changes(spark, s"$root/base", s"$root/app", s"$root/dv",
      batchId = 2L, Seq("id")).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(cdf2 == Set(("update_pre", "v1-7"), ("update_post", "v2-7")))
  }

  test("streaming MoR upsert drain (q195 shape): multiple real batches, base never rewritten") {
    val dir = "/root/testdata/sf0.001"
    val root = graft.streaming.Events.runMorUpsertDrain(spark, dir)
    val baseBytes = fileChecksums(s"$root/base")
    // the drain produced three distinct upsert batches (__batch is a
    // partition directory column now — cast, inference may type it int)
    val appTags = spark.read.parquet(s"$root/app")
      .select(col("__batch").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(appTags.size == 3, s"expected 3 staged micro-batches, got $appTags")
    val dvTags = spark.read.parquet(s"$root/dv")
      .select("__dv_batch").distinct().collect().map(_.getLong(0)).toSet
    assert(dvTags.nonEmpty && dvTags.subsetOf(appTags),
      "tombstones must be attributed to real batches (batch 1 inserts into an empty base, so it marks nothing)")
    // state == one-shot argmax over the log
    val got = graft.rel.DeleteVectors.readMor(spark, s"$root/base", s"$root/app", s"$root/dv")
      .select("user_id", "event_type").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // expected argmax over the SAME normalized ts the pipeline orders by
    // (micro-truncated) — ordering by the raw nanos column would encode
    // a different tie-break than both the drain and the DuckDB oracle
    val ev = Queries.events(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val expected = ev
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_type").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
    assert(fileChecksums(s"$root/base") == baseBytes,
      "the streaming sink must never rewrite a base file")
  }

  test("readMorAsOf: horizon 0 == base, horizon k == state after batch k, horizon max == readMor") {
    import spark.implicits._
    val root = Files.createTempDirectory("dv-suite-").toString
    (0L until 300L).map(i => (i, s"v0-$i")).toDF("id", "v")
      .repartition(3).write.parquet(s"$root/base")
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      (0L until 40L).map(i => (i, s"v1-$i")).toDF("id", "v"), Seq("id"), batchId = 1L)
    DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
      ((20L until 60L) ++ Seq(900L)).map(i => (i, s"v2-$i")).toDF("id", "v"),
      Seq("id"), batchId = 2L)
    def state(horizon: Long) =
      DeleteVectors.readMorAsOf(spark, s"$root/base", s"$root/app", s"$root/dv", horizon)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state(0L) == (0L until 300L).map(i => i -> s"v0-$i").toMap,
      "horizon 0 must be the untouched base")
    assert(state(1L) == ((0L until 300L).map(i => i -> s"v0-$i") ++
      (0L until 40L).map(i => i -> s"v1-$i")).toMap,
      "horizon 1 must exclude every batch-2 tombstone and append")
    val current = DeleteVectors.readMor(spark, s"$root/base", s"$root/app", s"$root/dv")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state(2L) == current, "horizon at the newest batch == the current read")
  }

  test("compactAll: fresh single-region table == readMor; file count drops; no sidecar needed") {
    import spark.implicits._
    val root = Files.createTempDirectory("dv-suite-").toString
    (0L until 600L).map(i => (i, s"v0-$i")).toDF("id", "v")
      .repartition(6).write.parquet(s"$root/base")
    (1 to 4).foreach { b =>
      DeleteVectors.upsert(spark, s"$root/base", s"$root/app", s"$root/dv",
        (0L until 60L).map(i => (i, s"v$b-$i")).toDF("id", "v"), Seq("id"), batchId = b.toLong)
    }
    val mor = DeleteVectors.readMor(spark, s"$root/base", s"$root/app", s"$root/dv")
    val regionFiles = mor.inputFiles.length
    val fresh = DeleteVectors.compactAll(spark, s"$root/base", s"$root/app", s"$root/dv",
      s"$root/fresh", 3)
    assert(fresh.collect().map(_.toSeq).toSet == mor.collect().map(_.toSeq).toSet)
    assert(fresh.inputFiles.length == 3 && fresh.inputFiles.length < regionFiles)
    // readable with no sidecar at all
    assert(DeleteVectors.read(spark, s"$root/fresh", s"$root/no-dv").count() == 600L)
  }

  test("vacuum: physical rewrite == merge-on-read; fresh table needs no sidecar") {
    val root = Files.createTempDirectory("dv-suite-").toString
    writeTable(s"$root/t")
    DeleteVectors.markDeletes(spark, s"$root/t", col("bucket") === 5, s"$root/dv")
    val mor = DeleteVectors.read(spark, s"$root/t", s"$root/dv")
      .collect().map(_.toSeq).toSet
    val compacted = DeleteVectors.vacuum(spark, s"$root/t", s"$root/dv", s"$root/t2", 3)
    assert(compacted.collect().map(_.toSeq).toSet == mor)
    assert(compacted.inputFiles.length == 3)
  }
}
