package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Z-ORDER CLUSTERING + FILE-LEVEL MIN/MAX DATA SKIPPING — the layout
  * half of what makes a 100 TB scan cheap: a one-time clustered rewrite
  * (Delta's OPTIMIZE ZORDER BY / Iceberg sort orders) so that every
  * data file covers a TIGHT rectangle of the (x, y) key space, plus a
  * stats manifest (one row of min/max per file — KBs for thousands of
  * files) that lets a box predicate resolve which files can possibly
  * hold matches BEFORE any file is opened.
  *
  * Why the interleave and not a plain sort: sorting by x alone makes
  * x-ranges tight but leaves every file spanning ALL of y, so a
  * predicate on y prunes nothing. Sorting by the Morton value
  * ([[graft.functions.ZOrder2]], codegen'd) makes both dimensions'
  * per-file ranges shrink like √(1/files), so boxes on x, on y, or on
  * both all skip — [[graft.rel.ZOrderSuite]] pins exactly this
  * asymmetry against a single-column layout.
  *
  * Scale shape: the clustered write is one range-shuffle by z-value
  * (`repartitionByRange` samples boundaries; each task writes one
  * file), the stats pass is one distributed `groupBy(input_file_name)`
  * aggregation, and the manifest is O(files) driver state — the same
  * bounded-collect discipline as the snapshot manifests. The pruned
  * read lists ONLY surviving files (the skipped ones never reach the
  * scan's file index) and re-applies the predicate as the residual
  * filter, so pruning is a pure optimization: the DuckDB oracle gates
  * that no overlapping file was wrongly skipped (missing rows go red).
  */
object ZOrder {

  final case class FileStats(
      file: String, minX: Long, maxX: Long, minY: Long, maxY: Long)

  /** The ONE clustered-write + per-file stats kernel both manifest
    * forms share: write `df` range-partitioned and sorted by `zCol`
    * into `numFiles` files at `dir`, and return the UNCOLLECTED stats
    * frame (`file, min_x, max_x, min_y, max_y`) for the caller to
    * collect (driver form) or write (table form).
    */
  private def clusteredWrite(
      df: DataFrame, zCol: org.apache.spark.sql.Column,
      xCol: String, yCol: String, dir: String, numFiles: Int): DataFrame = {
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.parquet(dir)
    df.sparkSession.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(xCol)).cast("long").as("min_x"), max(col(xCol)).cast("long").as("max_x"),
        min(col(yCol)).cast("long").as("min_y"), max(col(yCol)).cast("long").as("max_y"))
  }

  /** Rewrite `df` clustered by the Morton value of (`xCol`, `yCol`) into
    * `numFiles` range-partitioned, z-sorted parquet files at `dir`, and
    * return the per-file min/max stats manifest (computed by one
    * distributed pass over the written files).
    */
  def cluster(
      df: DataFrame, xCol: String, yCol: String,
      dir: String, numFiles: Int): Seq[FileStats] = {
    GraftFunctions.register(df.sparkSession)
    val folded = clusteredWrite(df,
      GraftFunctions.zorder2(col(xCol).cast("long"), col(yCol).cast("long")),
      xCol, yCol, dir, numFiles)
      .collect()
      .map(r => FileStats(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // coverage completion, like the table form: a zero-row part file
    // gets an impossible rectangle so it is skipped by a COVERED
    // decision, never by absence from the manifest
    val covered = folded.map(_.file).toSet
    val sentinels = df.sparkSession.read.parquet(dir).inputFiles
      .filterNot(covered)
      .map(FileStats(_, Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue))
    (folded ++ sentinels).toSeq.sortBy(_.file)
  }

  // ---- TABLE-FORM stats manifest: the 100 TB shape ---------------------
  //
  // Same discipline as [[BloomSkip]]'s table form: at 10⁶–10⁷ files the
  // min/max manifest is DATA — a parquet table (file, min_x, max_x,
  // min_y, max_y) written by the distributed stats pass (never
  // collected), and the box-overlap decision a distributed filter over
  // it; the driver receives only surviving file names.

  /** Per-dimension stats-column naming: (column, (minAlias, maxAlias)).
    * The 2-D form keeps its historical `min_x/max_x/min_y/max_y` names;
    * the N-D form indexes `min_i/max_i`.
    */
  private def specs2(xCol: String, yCol: String): Seq[(String, (String, String))] =
    Seq(xCol -> ("min_x", "max_x"), yCol -> ("min_y", "max_y"))
  private def specsN(cols: Seq[String]): Seq[(String, (String, String))] =
    cols.zipWithIndex.map { case (c, i) => c -> (s"min_$i", s"max_$i") }

  /** Index exactly `files` into the stats table: one distributed
    * `groupBy(input_file_name)` min/max pass appended to `statsDir`,
    * then COVERAGE-COMPLETED — a zero-row file (an empty range
    * partition's part file) contributes no agg row, so it gets an
    * explicit IMPOSSIBLE rectangle (min=Long.Max > max=Long.Min) that
    * every box misses: the file is skipped CORRECTLY, by a covered
    * decision, not by absence. Every data file is therefore always
    * represented, which is what lets the pruned reads refuse loudly
    * when a file appears behind the manifest's back.
    */
  private def indexFilesInto(
      spark: SparkSession, files: Seq[String],
      specs: Seq[(String, (String, String))], statsDir: String): Unit = {
    if (files.isEmpty) return
    import spark.implicits._
    val aggs = specs.flatMap { case (c, (lo, hi)) =>
      Seq(min(col(c)).cast("long").as(lo), max(col(c)).cast("long").as(hi))
    }
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("append").parquet(statsDir)
    val uncovered = files.toDF("file")
      .join(spark.read.parquet(statsDir).select("file"), Seq("file"), "left_anti")
    if (!uncovered.isEmpty)
      uncovered.select(col("file") +: specs.flatMap { case (_, (lo, hi)) =>
        Seq(lit(Long.MaxValue).as(lo), lit(Long.MinValue).as(hi))
      }: _*).write.mode("append").parquet(statsDir)
  }

  /** INCREMENTAL stats maintenance shared by both arities: index only
    * the files of `dir` the stats table does not cover yet — O(new
    * files) work appended to `statsDir`; covered rows are immutable and
    * never rewritten (data files are immutable in every layout this
    * engine writes, so a covered rectangle can never go stale). The
    * new-file discovery is a distributed anti-join of the directory
    * listing against the stats table — [[BloomSkip.extendManifestTable]]'s
    * twin for the min/max index.
    */
  private def extendStats(
      spark: SparkSession, statsDir: String, dir: String,
      specs: Seq[(String, (String, String))]): Unit = {
    import spark.implicits._
    val newFiles = spark.read.parquet(dir).inputFiles.toSeq.toDF("file")
      .join(spark.read.parquet(statsDir).select("file"), Seq("file"), "left_anti")
      .as[String].collect().toIndexedSeq
    indexFilesInto(spark, newFiles, specs, statsDir)
  }

  def extendStatsTable(
      spark: SparkSession, statsDir: String, dir: String,
      xCol: String, yCol: String): Unit =
    extendStats(spark, statsDir, dir, specs2(xCol, yCol))

  def extendStatsTableN(
      spark: SparkSession, statsDir: String, dir: String,
      cols: Seq[String]): Unit =
    extendStats(spark, statsDir, dir, specsN(cols))

  /** COVERAGE GUARD: refuse the pruned read when `dataDir` holds a file
    * the stats table does not cover. Silent skipping of an unindexed
    * file is the ONE failure mode a skipping index must never have —
    * builds and extends complete coverage explicitly (impossible-
    * rectangle rows for zero-row files), so an uncovered file can only
    * mean out-of-band appends; the fix is [[extendStatsTable]]. The
    * check is a distributed anti-join (the directory listing the scan
    * planner needs anyway vs the stats table's key column).
    */
  private def requireCovered(
      spark: SparkSession, statsDir: String, dataDir: String): Unit = {
    import spark.implicits._
    val uncovered = spark.read.parquet(dataDir).inputFiles.toSeq.toDF("file")
      .join(spark.read.parquet(statsDir).select("file"), Seq("file"), "left_anti")
      .as[String].head(3)
    require(uncovered.isEmpty,
      s"z-order stats table $statsDir does not cover data files of " +
        s"$dataDir (e.g. ${uncovered.mkString(", ")}): a pruned read would " +
        "silently skip them — run extendStatsTable to index the appends")
  }

  /** [[cluster]] with the stats manifest written as a parquet TABLE at
    * `statsDir` instead of collected: the one distributed
    * `groupBy(input_file_name)` pass lands directly in parquet,
    * coverage-completed ([[indexFilesInto]]).
    */
  def clusterTable(
      df: DataFrame, xCol: String, yCol: String,
      dir: String, numFiles: Int, statsDir: String): Unit = {
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    // the returned stats frame is lazy — discarding it costs nothing,
    // and the write itself stays the ONE shared clustered-write kernel
    clusteredWrite(df,
      GraftFunctions.zorder2(col(xCol).cast("long"), col(yCol).cast("long")),
      xCol, yCol, dir, numFiles): Unit
    indexFilesInto(spark, spark.read.parquet(dir).inputFiles.toIndexedSeq,
      specs2(xCol, yCol), statsDir)
  }

  /** The box-overlap decision as a DISTRIBUTED frame over the stats
    * table — a plain filter on the rectangle columns (codegen'd, no
    * UDF), returned un-collected so callers can compose or plan-pin it.
    */
  def overlappingFiles(
      spark: SparkSession, statsDir: String,
      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame =
    spark.read.parquet(statsDir)
      .filter(col("max_x") >= x1 && col("min_x") <= x2 &&
        col("max_y") >= y1 && col("min_y") <= y2)
      .select("file")

  /** Box read through the table-form stats: coverage-guarded
    * ([[requireCovered]] — a data file the stats miss fails loudly,
    * never a silent skip), then the distributed pruning decision, then
    * open ONLY the surviving files with the box as the residual filter.
    */
  def prunedReadTable(
      spark: SparkSession, statsDir: String, dataDir: String,
      xCol: String, yCol: String,
      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    import spark.implicits._
    requireCovered(spark, statsDir, dataDir)
    val files = overlappingFiles(spark, statsDir, x1, x2, y1, y2)
      .as[String].collect().toIndexedSeq.sorted
    if (files.isEmpty) BloomSkip.emptyFromManifest(spark, statsDir, "clustered")
    else spark.read.parquet(files: _*)
      .filter(col(xCol).between(x1, x2) && col(yCol).between(y1, y2))
  }

  // ---- k-D: N clustering columns (real OPTIMIZE ZORDER BY arity) ------

  /** Exact-integer quantization of a wide-domain column onto the
    * [0, 2^bits) grid [[graft.functions.ZOrderN]] accepts: with
    * `step = ⌈(max−min+1) / 2^bits⌉`, the bucket `(v − min) / step` is
    * monotone in v, exactly computed in Long arithmetic (no double
    * rounding, no overflow — `v − min ≤ range` by construction), and
    * bounded by 2^bits − 1. Quantization only COARSENS the clustering
    * grid; pruning correctness never depends on it because the stats
    * manifest stores the RAW column min/max and the raw predicate is
    * always the residual.
    */
  def quantize(c: org.apache.spark.sql.Column, minV: Long, maxV: Long,
      bits: Int): org.apache.spark.sql.Column = {
    val cells = 1L << bits
    val range = maxV - minV + 1
    val step = math.max(1L, (range + cells - 1) / cells)
    // floor BEFORE the long cast: a bare cast(double as long) truncates
    // toward zero, which is non-monotone across zero and disagrees with
    // DuckDB's round-to-nearest CAST — floor is monotone everywhere and
    // both engines compute it identically, so a FRACTIONAL clustering
    // column quantizes the same on the engine and oracle sides.
    // `div`, not `/`: Spark's / is true (double) division, whose 53-bit
    // mantissa would mis-bucket keys past 2^53 — div stays in Long
    org.apache.spark.sql.functions.call_function(
      "div", floor(c).cast("long") - lit(minV), lit(step))
  }

  /** [[clusterTable]] generalized to N columns: one range-shuffle by
    * the N-way Morton value ([[graft.functions.ZOrderN]]), per-file
    * min/max stats for EVERY clustering column written as a parquet
    * table (`file, min_0, max_0, …`). Columns are quantized onto the
    * interleave grid from their observed min/max (one scalar agg), so
    * any Long-domain column clusters; the stats are over the RAW
    * values, so pruning never trusts the quantization.
    */
  /** Returns the global (min, max) per clustering column — the grid the
    * quantization used — so callers re-deriving the z-value (q201's
    * output) reuse it instead of re-scanning the table.
    */
  def clusterTableN(
      df: DataFrame, cols: Seq[String],
      dir: String, numFiles: Int, statsDir: String): Seq[(Long, Long)] = {
    require(cols.size >= 2, s"clusterTableN needs >= 2 columns, got $cols")
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    val bits = 63 / cols.size
    // floor-then-cast for the SAME reason as [[quantize]]: the grid's
    // min must be ≤ every floor(v), which trunc-toward-zero would break
    // for negative fractional minima
    val mmAggs = cols.flatMap(c =>
      Seq(floor(min(col(c))).cast("long"), floor(max(col(c))).cast("long")))
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    require(!(0 until 2 * cols.size).exists(mm.isNullAt),
      s"clusterTableN($cols): zero-row input or an all-NULL clustering " +
        "column has no quantization grid — nothing to cluster")
    val qcols = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }
    df.withColumn("__z", GraftFunctions.zorderN(qcols: _*))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.parquet(dir)
    indexFilesInto(spark, spark.read.parquet(dir).inputFiles.toIndexedSeq,
      specsN(cols), statsDir)
    cols.indices.map(i => (mm.getLong(2 * i), mm.getLong(2 * i + 1)))
  }

  /** N-dimensional box read through the table-form stats: coverage-
    * guarded ([[requireCovered]]), then the overlap decision as a
    * distributed filter over the stats table (one conjunct per
    * dimension), then ONLY surviving files are opened with the full box
    * as the residual filter.
    */
  def prunedReadTableN(
      spark: SparkSession, statsDir: String, dataDir: String,
      cols: Seq[String], bounds: Seq[(Long, Long)]): DataFrame = {
    require(cols.size == bounds.size, "one (lo, hi) bound per column")
    import spark.implicits._
    requireCovered(spark, statsDir, dataDir)
    val overlap = bounds.zipWithIndex.map { case ((lo, hi), i) =>
      col(s"max_$i") >= lo && col(s"min_$i") <= hi
    }.reduce(_ && _)
    val files = spark.read.parquet(statsDir).filter(overlap)
      .select("file").as[String].collect().toIndexedSeq.sorted
    val residual = cols.zip(bounds).map { case (c, (lo, hi)) =>
      col(c).between(lo, hi)
    }.reduce(_ && _)
    if (files.isEmpty) BloomSkip.emptyFromManifest(spark, statsDir, "clustered")
    else spark.read.parquet(files: _*).filter(residual)
  }

  /** The files of `stats` whose min/max rectangle intersects the box —
    * the skipping decision, file opens cost zero.
    */
  def overlapping(
      stats: Seq[FileStats],
      x1: Long, x2: Long, y1: Long, y2: Long): Seq[String] =
    stats.filter(s => s.maxX >= x1 && s.minX <= x2 && s.maxY >= y1 && s.minY <= y2)
      .map(_.file)

  /** Box read over a clustered table: open ONLY the overlapping files,
    * then apply the full predicate as the residual filter.
    */
  def prunedRead(
      spark: SparkSession, stats: Seq[FileStats],
      xCol: String, yCol: String,
      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    require(stats.nonEmpty, "empty stats manifest: table was never clustered")
    val files = overlapping(stats, x1, x2, y1, y2)
    // a box outside every file's rectangle is a LEGAL empty result:
    // serve the typed empty frame from one file's schema, zero row reads
    if (files.isEmpty)
      spark.read.parquet(stats.head.file).filter(lit(false))
    else spark.read.parquet(files: _*)
      .filter(col(xCol).between(x1, x2) && col(yCol).between(y1, y2))
  }
}
