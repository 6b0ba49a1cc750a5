package graft.rel

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{GraftFunctions, ZOrder2}

/** Pins for the z-order clustering + data-skipping layer:
  * expression bit-exactness (interpreted == codegen'd == a hand-rolled
  * per-bit reference), the layout asymmetry that justifies the Morton
  * interleave over a single-column sort (a y-only box prunes files under
  * z-order but cannot under an x-sort), and the read-path contract that
  * skipped files never reach the scan's file index while the surviving
  * rows exactly equal the unpruned filter.
  */
class ZOrderSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- expression -------------------------------------------------------

  /** Per-bit reference: bit i of x → 2i, bit i of y → 2i+1. */
  private def slowInterleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave: known bit patterns and per-bit reference agreement") {
    assert(ZOrder2.interleave(0L, 0L) == 0L)
    assert(ZOrder2.interleave(1L, 0L) == 1L) // x bit 0 → output bit 0
    assert(ZOrder2.interleave(0L, 1L) == 2L) // y bit 0 → output bit 1
    assert(ZOrder2.interleave(3L, 3L) == 15L)
    assert(ZOrder2.interleave(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrder2.interleave(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ZOrder2.interleave(Int.MaxValue.toLong, Int.MaxValue.toLong) ==
      0x3FFFFFFFFFFFFFFFL) // 62 bits set: result stays non-negative
    // pseudo-random sweep against the per-bit reference
    var seed = 0x9E3779B97F4A7C15L
    (1 to 200).foreach { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val x = (seed >>> 33) & Int.MaxValue.toLong
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val y = (seed >>> 33) & Int.MaxValue.toLong
      assert(ZOrder2.interleave(x, y) == slowInterleave(x, y), s"($x, $y)")
    }
  }

  test("interleave is order-compatible per dimension (monotone when the other is fixed)") {
    val probe = Seq(0L, 1L, 2L, 5L, 100L, 65535L, 65536L, 1000000L)
    for (fixed <- Seq(0L, 7L, 12345L); w <- probe.sliding(2)) {
      assert(ZOrder2.interleave(w(0), fixed) < ZOrder2.interleave(w(1), fixed))
      assert(ZOrder2.interleave(fixed, w(0)) < ZOrder2.interleave(fixed, w(1)))
    }
  }

  test("out-of-range inputs throw (interpreted and codegen'd) instead of folding") {
    intercept[IllegalArgumentException](ZOrder2.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrder2.interleave(0L, 1L << 31))
    GraftFunctions.register(spark)
    import spark.implicits._
    val bad = Seq((-1L, 2L)).toDF("x", "y")
      .select(GraftFunctions.zorder2(col("x"), col("y")))
    val e = intercept[Exception](bad.collect())
    // wrapped by Spark's task failure machinery — walk the cause chain
    // and require the range guard's own message, so deleting the codegen
    // check can't slip past on an unrelated failure
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("zorder2 input out of")),
      s"expected the zorder2 range-guard message in the cause chain, got: $messages")
  }

  test("codegen'd column result == interpreted interleave over a sweep") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = for (x <- 0L to 40L; y <- 0L to 40L) yield (x * 77L, y * 991L)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), GraftFunctions.zorder2(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder2.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  // ---- clustering + skipping --------------------------------------------

  /** 64×64 uniform grid, 4096 rows — every (x, y) cell once. */
  private def grid() = {
    import spark.implicits._
    (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64, i.toLong))
      .toDF("x", "y", "id")
  }

  test("layout asymmetry: a y-only box prunes under z-order, cannot under an x-sort") {
    val dir = Files.createTempDirectory("zorder-suite-").toString
    val df = grid()
    val zStats = ZOrder.cluster(df, "x", "y", s"$dir/z", 16)
    // the single-column layout: same file count, sorted by x alone
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/x")
    val xStats = spark.read.parquet(s"$dir/x")
      .groupBy(input_file_name().as("file"))
      .agg(min(col("x")).cast("long").as("min_x"), max(col("x")).cast("long").as("max_x"),
        min(col("y")).cast("long").as("min_y"), max(col("y")).cast("long").as("max_y"))
      .collect()
      .map(r => ZOrder.FileStats(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

    assert(zStats.length == 16 && xStats.length == 16)
    // y-only box: 1/8 of the y range, all of x
    val zSurvivors = ZOrder.overlapping(zStats, 0L, 63L, 0L, 7L)
    val xSurvivors = ZOrder.overlapping(xStats, 0L, 63L, 0L, 7L)
    assert(zSurvivors.length < zStats.length,
      s"z-order layout must prune a y-only box: ${zSurvivors.length}/${zStats.length}")
    assert(xSurvivors.length == xStats.length,
      "an x-sorted layout cannot prune a y-only box: every file spans all of y")
    // x-only box prunes under BOTH layouts
    assert(ZOrder.overlapping(zStats, 0L, 7L, 0L, 63L).length < zStats.length)
    assert(ZOrder.overlapping(xStats, 0L, 7L, 0L, 63L).length < xStats.length)
  }

  test("prunedRead: scan's file index holds only surviving files; rows == unpruned filter") {
    val dir = Files.createTempDirectory("zorder-suite-").toString
    val df = grid()
    val stats = ZOrder.cluster(df, "x", "y", s"$dir/t", 16)
    val (x1, x2, y1, y2) = (10L, 20L, 5L, 30L)
    val pruned = ZOrder.prunedRead(spark, stats, "x", "y", x1, x2, y1, y2)

    val survivors = ZOrder.overlapping(stats, x1, x2, y1, y2).toSet
    assert(survivors.nonEmpty && survivors.size < stats.length,
      s"box should survive some but not all files: ${survivors.size}/${stats.length}")
    val scanned = pruned.inputFiles.toSet
    assert(scanned == survivors,
      s"scan must list exactly the surviving files: scanned=${scanned.size}, survivors=${survivors.size}")

    val expected = spark.read.parquet(s"$dir/t")
      .filter(col("x").between(x1, x2) && col("y").between(y1, y2))
      .select("x", "y", "id").collect().map(_.toSeq).toSet
    val got = pruned.select("x", "y", "id").collect().map(_.toSeq).toSet
    assert(got == expected, "pruning is a pure optimization: result must equal the full-scan filter")
  }

  test("box outside every rectangle: typed empty result, zero surviving files") {
    val dir = Files.createTempDirectory("zorder-suite-").toString
    val stats = ZOrder.cluster(grid(), "x", "y", s"$dir/t", 8)
    assert(ZOrder.overlapping(stats, 100L, 200L, 100L, 200L).isEmpty)
    val empty = ZOrder.prunedRead(spark, stats, "x", "y", 100L, 200L, 100L, 200L)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("x", "y", "id"))
  }

  test("table-form stats: same survivors and rows as the driver form; overlap is a distributed filter") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zorder-suite-").toString
    val df = grid()
    val seqStats = ZOrder.cluster(df, "x", "y", s"$dir/z", 16)
    ZOrder.clusterTable(df, "x", "y", s"$dir/zt", 16, s"$dir/stats")
    val (x1, x2, y1, y2) = (10L, 20L, 5L, 30L)
    // same box → same data, independent of which layout pass wrote it
    val seqRows = ZOrder.prunedRead(spark, seqStats, "x", "y", x1, x2, y1, y2)
      .select("x", "y", "id").collect().map(_.toString).sorted.toSeq
    val tabRows = ZOrder.prunedReadTable(spark, s"$dir/stats", s"$dir/zt", "x", "y", x1, x2, y1, y2)
      .select("x", "y", "id").collect().map(_.toString).sorted.toSeq
    assert(tabRows == seqRows)
    // survivor COUNT matches the driver form (file names differ by dir)
    val survivors = ZOrder.overlappingFiles(spark, s"$dir/stats", x1, x2, y1, y2)
      .as[String].collect()
    assert(survivors.length == ZOrder.overlapping(seqStats, x1, x2, y1, y2).length)
    // the decision plans as a scan of the stats TABLE + a codegen'd
    // filter on the rectangle columns — no driver loop, no UDF
    val plan = ZOrder.overlappingFiles(spark, s"$dir/stats", x1, x2, y1, y2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("stats"), s"overlap must scan the stats table:\n$plan")
    assert(plan.contains("Filter"), s"overlap must be a distributed filter:\n$plan")
    // out-of-domain box: typed empty frame through the table path too
    val empty = ZOrder.prunedReadTable(spark, s"$dir/stats", s"$dir/zt", "x", "y", 100L, 200L, 100L, 200L)
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("x", "y", "id"))
  }

  // ---- k-D (ZOrderN) ----------------------------------------------------

  /** 16×16×16 uniform cube, 4096 rows — every (x, y, w) cell once. */
  private def cube() = {
    import spark.implicits._
    (0 until 4096).map(i =>
      (i.toLong % 16, (i.toLong / 16) % 16, i.toLong / 256, i.toLong))
      .toDF("x", "y", "w", "id")
  }

  test("zorder_n(2) == zorder2 bit-for-bit; eval == codegen over a sweep") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // n=2: 31 bits per dim — identical placement to ZOrder2 (x even, y odd)
    var seed = 0x243F6A8885A308D3L
    (1 to 200).foreach { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val x = (seed >>> 33) & Int.MaxValue.toLong
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val y = (seed >>> 33) & Int.MaxValue.toLong
      assert(graft.functions.ZOrderN.interleave(Array(x, y)) ==
        ZOrder2.interleave(x, y), s"($x, $y)")
    }
    // n=3 codegen'd column == interpreted reference
    val rows = for (x <- 0L to 15L; y <- 0L to 15L; w <- Seq(0L, 7L, 15L))
      yield (x * 131L, y * 997L, w * 139000L) // 15·139000 < 2^21
    val got = rows.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        GraftFunctions.zorderN(col("x"), col("y"), col("w")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) == graft.functions.ZOrderN.interleave(
        Array(r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    // out-of-domain throws in both paths (21-bit limit for n=3)
    intercept[IllegalArgumentException](
      graft.functions.ZOrderN.interleave(Array(1L << 21, 0L, 0L)))
    val bad = Seq((1L << 21, 0L, 0L)).toDF("x", "y", "w")
      .select(GraftFunctions.zorderN(col("x"), col("y"), col("w")))
    val e = intercept[Exception](bad.collect())
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("zorder_n(3) input out of")), messages)
  }

  test("quantize: exact integer steps, monotone, bounded by the grid") {
    import spark.implicits._
    // a domain far past 2^21 — double division would mis-bucket here
    val minV = 0L
    val maxV = (1L << 40) - 1
    val vs = Seq(0L, 1L, (1L << 19) - 1, 1L << 19, (1L << 40) - 1)
    val q = vs.toDF("v")
      .select(ZOrder.quantize(col("v"), minV, maxV, 21).as("q"))
      .collect().map(_.getLong(0))
    assert(q.sliding(2).forall(w => w(0) <= w(1)), s"not monotone: ${q.toSeq}")
    assert(q.forall(b => b >= 0 && b < (1L << 21)), s"out of grid: ${q.toSeq}")
    assert(q.last == (1L << 21) - 1, "max value must land in the last cell")
  }

  test("3-D layout asymmetry: a box on the THIRD dimension alone prunes under zorder_n, not under an x-sort") {
    val dir = Files.createTempDirectory("zorder3-suite-").toString
    val df = cube()
    ZOrder.clusterTableN(df, Seq("x", "y", "w"), s"$dir/z", 16, s"$dir/zstats")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/x")
    val xStats = spark.read.parquet(s"$dir/x")
      .groupBy(input_file_name().as("file"))
      .agg(min(col("w")).cast("long").as("min_2"), max(col("w")).cast("long").as("max_2"))
    val nFiles = spark.read.parquet(s"$dir/zstats").count()
    assert(nFiles == 16)
    // w-only box: 1/8 of the w range, all of x and y
    val zSurvivors = spark.read.parquet(s"$dir/zstats")
      .filter(col("max_2") >= 0L && col("min_2") <= 1L).count()
    val xSurvivors = xStats.filter(col("max_2") >= 0L && col("min_2") <= 1L).count()
    assert(zSurvivors < nFiles,
      s"3-D z-order must prune a w-only box: $zSurvivors/$nFiles")
    assert(xSurvivors == 16,
      "an x-sorted layout cannot prune a w-only box: every file spans all of w")
    // the pruned read is exact: rows == plain filter, on a mixed box
    val bounds = Seq((2L, 9L), (0L, 15L), (0L, 3L))
    val got = ZOrder.prunedReadTableN(spark, s"$dir/zstats", s"$dir/z",
      Seq("x", "y", "w"), bounds)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = df.filter(col("x").between(2, 9) && col("w").between(0, 3))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("manifest rectangles cover the data: every row's keys inside its file's min/max") {
    val dir = Files.createTempDirectory("zorder-suite-").toString
    val stats = ZOrder.cluster(grid(), "x", "y", s"$dir/t", 8)
    val byFile = stats.map(s => s.file -> s).toMap
    spark.read.parquet(s"$dir/t")
      .withColumn("__f", input_file_name())
      .collect()
      .foreach { r =>
        val s = byFile(r.getAs[String]("__f"))
        val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
        assert(x >= s.minX && x <= s.maxX && y >= s.minY && y <= s.maxY)
      }
  }

  test("stats-table extend: O(new) appends; coverage guard refuses a behind-the-back file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zorder-extend-").toString
    val df = grid()
    ZOrder.clusterTable(df, "x", "y", s"$dir/t", 8, s"$dir/stats")
    val before = spark.read.parquet(s"$dir/stats").collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    // a file appended BEHIND the stats table's back: the pruned read
    // must REFUSE — silently skipping it would lose its rows (the one
    // failure mode a skipping index must never have)
    Seq((12L, 7L, 9999L)).toDF("x", "y", "id")
      .coalesce(1).write.mode("append").parquet(s"$dir/t")
    val e = intercept[IllegalArgumentException](
      ZOrder.prunedReadTable(spark, s"$dir/stats", s"$dir/t",
        "x", "y", 10L, 20L, 5L, 30L))
    assert(e.getMessage.contains("extendStatsTable"), e.getMessage)
    // incremental extend: indexes ONLY the appended file — covered rows
    // are byte-identical (immutable), and the read serves again with
    // the appended row included
    ZOrder.extendStatsTable(spark, s"$dir/stats", s"$dir/t", "x", "y")
    val after = spark.read.parquet(s"$dir/stats").collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(after.keySet == spark.read.parquet(s"$dir/t").inputFiles.toSet,
      "stats must cover exactly the directory's files")
    before.foreach { case (f, row) =>
      assert(after(f) == row, s"covered stats row rewritten for $f")
    }
    val got = ZOrder.prunedReadTable(spark, s"$dir/stats", s"$dir/t",
      "x", "y", 10L, 20L, 5L, 30L)
      .select("x", "y", "id").collect().map(_.toSeq).toSet
    val want = spark.read.parquet(s"$dir/t")
      .filter(col("x").between(10, 20) && col("y").between(5, 30))
      .select("x", "y", "id").collect().map(_.toSeq).toSet
    assert(got == want && want.exists(_.last == 9999L))
    // extending again with nothing new appends nothing
    ZOrder.extendStatsTable(spark, s"$dir/stats", s"$dir/t", "x", "y")
    assert(spark.read.parquet(s"$dir/stats").count() == after.size.toLong)
    // the N-D twin: same guard, same extend
    val dirN = Files.createTempDirectory("zorder-extendn-").toString
    ZOrder.clusterTableN(cube(), Seq("x", "y", "w"), s"$dirN/t", 8, s"$dirN/stats")
    Seq((3L, 3L, 1L, 8888L)).toDF("x", "y", "w", "id")
      .coalesce(1).write.mode("append").parquet(s"$dirN/t")
    val eN = intercept[IllegalArgumentException](
      ZOrder.prunedReadTableN(spark, s"$dirN/stats", s"$dirN/t",
        Seq("x", "y", "w"), Seq((0L, 15L), (0L, 15L), (0L, 3L))))
    assert(eN.getMessage.contains("extendStatsTable"), eN.getMessage)
    ZOrder.extendStatsTableN(spark, s"$dirN/stats", s"$dirN/t", Seq("x", "y", "w"))
    val gotN = ZOrder.prunedReadTableN(spark, s"$dirN/stats", s"$dirN/t",
      Seq("x", "y", "w"), Seq((0L, 15L), (0L, 15L), (0L, 3L)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotN.contains(8888L))
  }

  test("zero-row part files carry an impossible rectangle: covered, always skipped, never refused") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zorder-empty-").toString
    // 3 distinct z-values into 8 range partitions → some part files are
    // written empty by the hash/range machinery on some layouts; force
    // the shape deterministically by appending an EMPTY single file
    ZOrder.clusterTable(grid(), "x", "y", s"$dir/t", 4, s"$dir/stats")
    grid().filter(col("x") < 0).coalesce(1)
      .write.mode("append").parquet(s"$dir/t")
    ZOrder.extendStatsTable(spark, s"$dir/stats", s"$dir/t", "x", "y")
    // every file covered, incl. the zero-row one (impossible rectangle)
    assert(spark.read.parquet(s"$dir/stats").count() ==
      spark.read.parquet(s"$dir/t").inputFiles.length.toLong)
    val sentinel = spark.read.parquet(s"$dir/stats")
      .filter(col("min_x") > col("max_x"))
    assert(sentinel.count() >= 1L, "zero-row file must carry a sentinel rectangle")
    // reads pass the guard and stay exact
    val got = ZOrder.prunedReadTable(spark, s"$dir/stats", s"$dir/t",
      "x", "y", 10L, 20L, 5L, 30L).count()
    val want = spark.read.parquet(s"$dir/t")
      .filter(col("x").between(10, 20) && col("y").between(5, 30)).count()
    assert(got == want)
  }
}
