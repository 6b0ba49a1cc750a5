package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HIDDEN PARTITIONING — Iceberg's partition-transform idea on plain
  * parquet: the table is laid out by a TRANSFORM of a data column
  * (`day(ts)`, `bucket(n, key)`), and the reader DERIVES the partition
  * predicate from the user's natural data predicate — the user never
  * names the partition column, so they can never forget it (the classic
  * Hive failure mode: a `ts` range query that full-scans because the
  * author didn't ALSO filter the `dt` string column).
  *
  * Why it matters at 100 TB: directory-level pruning is the cheapest
  * skipping there is — pruned partitions are never even LISTED, so a
  * day query over a year-partitioned table plans 1/365 of the files
  * before any stats or blooms come into play. The derivations here are
  * the two workhorse transforms:
  *
  *  - `day`: `ts ∈ [lo, hi)` ⟹ `day ∈ [date(lo), date(hi)]` — sound
  *    because day(·) is monotone in ts;
  *  - `bucket`: `key = k` ⟹ `bucket = hash(k) mod n` — sound because
  *    the probe's bucket is computed by evaluating the SAME Catalyst
  *    hash expression the writer used (never a reimplementation that
  *    could drift).
  *
  * The residual data predicate is always re-applied, so the derivation
  * is a pure optimization — PlanSuite-style pins assert the
  * PartitionFilters actually appear and prune; the DuckDB oracle gates
  * that no partition was wrongly skipped.
  */
object HiddenPartitioning {

  /** Partition column names are engine-reserved (never user-facing). */
  val DayCol = "__p_day"
  val BucketCol = "__p_bucket"

  /** Underscore-prefixed so Spark's file-listing treats it as metadata,
    * never data. Records the session timezone `day(ts)` was evaluated
    * under at WRITE time: the transform maps an instant to a local
    * date, so the zone is part of the layout, and a reader in a
    * different session zone that re-derived bounds with ITS zone could
    * prune a directory holding matching rows — silent row loss, the
    * one failure the residual filter cannot repair (pruned files are
    * never listed).
    */
  val ZoneMetaFile = "_graft_layout.zone"

  private def sessionZone(spark: SparkSession): String =
    spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)

  /** Lay `df` out day-partitioned by the transform `day(tsCol)`; the
    * evaluation zone is recorded alongside the layout ([[ZoneMetaFile]],
    * written through the Hadoop FileSystem of the PATH so remote stores
    * work like the data write itself).
    */
  def writeDayPartitioned(df: DataFrame, tsCol: String, dir: String): Unit = {
    df.withColumn(DayCol, to_date(col(tsCol)))
      .write.partitionBy(DayCol).parquet(dir)
    val p = new org.apache.hadoop.fs.Path(dir, ZoneMetaFile)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(sessionZone(df.sparkSession)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def recordedZone(spark: SparkSession, dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, ZoneMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Parse a bound string to an instant EXACTLY as `cast(lit(s) as
    * timestamp)` will in the residual filter (Catalyst's own Cast,
    * evaluated driver-side under the reader's session zone — no Spark
    * job, no reimplemented parser). None for an unparseable string,
    * mirroring the non-ANSI cast's NULL.
    */
  private def parseBound(spark: SparkSession, s: String): Option[java.time.Instant] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    // TRY mode: an unparseable bound must be the documented EMPTY
    // result, not an error — under Spark 4's default ANSI session the
    // plain Cast THROWS, so the mode is pinned explicitly
    Option(Cast(Literal(s), org.apache.spark.sql.types.TimestampType,
      Some(sessionZone(spark)), EvalMode.TRY).eval(null))
      .map(us => java.time.Instant.EPOCH.plus(
        us.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS))
  }

  /** Range read on the RAW timestamp — the day-partition predicate is
    * derived, the exact ts predicate re-applied as the residual. The
    * bounds `[lo, hi)` are interpreted in the READER's session zone
    * (predicate semantics belong to the reader), but the derived day
    * range is computed under the WRITER's recorded zone — the zone the
    * partition values were minted in. Both conversions happen driver-
    * side on the two literal instants, so the partition predicate is a
    * pair of foldable date literals (prunes at listing time). Tables
    * written before the zone was recorded fall back to the session
    * zone — the pre-r16 same-session contract. An unparseable bound is
    * a defined EMPTY result (the residual cast would be NULL), never a
    * crash.
    */
  def readTsRange(
      spark: SparkSession, dir: String, tsCol: String,
      lo: String, hi: String): DataFrame = {
    val zone = java.time.ZoneId.of(
      recordedZone(spark, dir).getOrElse(sessionZone(spark)))
    (parseBound(spark, lo), parseBound(spark, hi)) match {
      case (Some(loI), Some(hiI)) =>
        def dayIn(i: java.time.Instant): java.sql.Date =
          java.sql.Date.valueOf(java.time.LocalDate.ofInstant(i, zone))
        spark.read.parquet(dir)
          .filter(col(DayCol).between(lit(dayIn(loI)), lit(dayIn(hiI))))
          .filter(col(tsCol) >= lit(lo).cast("timestamp") &&
            col(tsCol) < lit(hi).cast("timestamp"))
          .drop(DayCol)
      case _ => // NULL bound: the residual matches nothing
        spark.read.parquet(dir).filter(lit(false)).drop(DayCol)
    }
  }

  /** Lay `df` out bucket-partitioned by `bucket(n, keyCol)` — Spark's
    * own murmur3 `hash` mod n, the same expression the reader derives
    * with. The key is canonicalized to LONG on BOTH sides: murmur3
    * hashes Int and Long differently, so without the cast an
    * IntegerType key column would silently route every probe to the
    * wrong bucket (zero rows, no error).
    */
  def writeBucketed(df: DataFrame, keyCol: String, n: Int, dir: String): Unit =
    df.withColumn(BucketCol, pmod(hash(col(keyCol).cast("long")), lit(n)))
      .write.partitionBy(BucketCol).parquet(dir)

  /** Equality probe on the RAW key — the probe's bucket is computed by
    * EVALUATING the writer's own hash expression on the literal (one
    * driver-side row, no reimplemented hash to drift), then only that
    * bucket's directory is listed; the exact key predicate is the
    * residual.
    */
  def readKeyEquals(
      spark: SparkSession, dir: String, keyCol: String, key: Long,
      n: Int): DataFrame = {
    val bucket = spark.range(1)
      .select(pmod(hash(lit(key).cast("long")), lit(n)).as("b")).head().getInt(0)
    spark.read.parquet(dir)
      .filter(col(BucketCol) === bucket)
      .filter(col(keyCol) === key)
      .drop(BucketCol)
  }

  // ---- PARTITION EVOLUTION (Iceberg partition-spec evolution) ----------
  //
  // The transform is table METADATA, not table identity: a table laid
  // out daily can switch to hourly when it grows — WITHOUT rewriting
  // history. Each transform change starts a new ERA: an immutable
  // sub-layout (`e0/`, `e1/`, …) holding exactly the rows written while
  // its spec was current, plus one line in the `_graft_layout.eras`
  // sidecar recording (dir, transform, zone). Readers derive a
  // partition predicate PER ERA from the one data predicate — each era
  // prunes under its own transform and zone — and union the eras; the
  // residual data predicate keeps the union exact, so a transform
  // change is invisible to query results (the q192 discipline, spec'd
  // per era).

  /** Hour-transform partition column (engine-reserved, like [[DayCol]]).
    * Values are `yyyy-MM-dd-HH` strings: lexicographic order == time
    * order, so directory-level pruning is a string BETWEEN.
    */
  val HourCol = "__p_hour"
  private val HourFmt = "yyyy-MM-dd-HH"

  /** Era sidecar: one `"<dir> <transform> <zone>"` line per era,
    * oldest first. Underscore-prefixed like [[ZoneMetaFile]].
    */
  val ErasMetaFile = "_graft_layout.eras"

  private final case class Era(dir: String, transform: String, zone: String)

  /** Atomic sidecar replace: full body to a temp file, then ONE
    * overwrite-rename onto the final name — a reader racing an evolve
    * (or a crash mid-write) sees the OLD complete era list or the NEW
    * one, never a truncated file that would silently drop whole eras'
    * rows from range reads. Through Hadoop `FileContext` (whose
    * Rename.OVERWRITE is atomic on HDFS and local alike), so remote
    * roots work like [[writeDayPartitioned]]'s data writes — java.nio
    * would silently treat an `hdfs://` root as a relative local path.
    * The temp file is removed on ANY failure (no orphan accumulation).
    */
  private def writeEras(spark: SparkSession, root: String, eras: Seq[Era]): Unit = {
    val body = eras.map(e => s"${e.dir} ${e.transform} ${e.zone}")
      .mkString("", "\n", "\n")
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath): Unit
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(rootPath.toUri, conf)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".$ErasMetaFile-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    var moved = false
    try {
      val out = fs.create(tmp, true)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fc.rename(tmp, new org.apache.hadoop.fs.Path(root, ErasMetaFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      moved = true
    } finally if (!moved) fs.delete(tmp, false): Unit
  }

  private def readEras(spark: SparkSession, root: String): Seq[Era] = {
    val p = new org.apache.hadoop.fs.Path(root, ErasMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$root is not an evolvable layout (no $ErasMetaFile)")
    val in = fs.open(p)
    val body =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    body.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(d, t, z) = line.split(" ", 3)
      Era(d, t, z)
    }
  }

  /** Write one era's rows under its transform. The transform evaluates
    * under the writer's SESSION zone, so the appender's zone must match
    * the era's recorded zone — the same write-time contract as
    * [[ZoneMetaFile]], enforced instead of assumed.
    */
  private def writeEraData(
      df: DataFrame, tsCol: String, root: String, era: Era): Unit = {
    require(sessionZone(df.sparkSession) == era.zone,
      s"appender session zone ${sessionZone(df.sparkSession)} != era's " +
        s"recorded zone ${era.zone}: the transform would mint partition " +
        "values the era's readers mis-derive")
    val out = s"$root/${era.dir}"
    era.transform match {
      case "day" =>
        df.withColumn(DayCol, to_date(col(tsCol)))
          .write.mode("append").partitionBy(DayCol).parquet(out)
      case "hour" =>
        df.withColumn(HourCol, date_format(col(tsCol), HourFmt))
          .write.mode("append").partitionBy(HourCol).parquet(out)
      case other => sys.error(s"unknown partition transform $other")
    }
  }

  /** Initialize an evolvable layout: era 0 is day-partitioned. */
  def initEvolvable(df: DataFrame, tsCol: String, root: String): Unit = {
    val era = Era("e0", "day", sessionZone(df.sparkSession))
    writeEraData(df, tsCol, root, era)
    writeEras(df.sparkSession, root, Seq(era))
  }

  /** PARTITION EVOLUTION: switch the layout's transform to hourly.
    * Metadata-only — one sidecar line; no historical row moves. Rows
    * appended from now on land in the new era's hourly directories.
    */
  def evolveToHourly(spark: SparkSession, root: String): Unit = {
    val eras = readEras(spark, root)
    require(eras.last.transform != "hour",
      s"layout $root is already hour-partitioned")
    writeEras(spark, root,
      eras :+ Era(s"e${eras.size}", "hour", sessionZone(spark)))
  }

  /** Append rows under the CURRENT era's transform. */
  def appendEvolvable(df: DataFrame, tsCol: String, root: String): Unit =
    writeEraData(df, tsCol, root, readEras(df.sparkSession, root).last)

  // -- bucket-count evolution (bucket(4) -> bucket(8)) -------------------

  /** Initialize an evolvable bucket layout: era 0 is `bucket(n, key)`.
    * Era transforms are recorded as `bucket:<n>` (the zone slot is
    * unused for hash buckets — recorded as `-`).
    */
  def initEvolvableBucketed(
      df: DataFrame, keyCol: String, n: Int, root: String): Unit = {
    require(n > 0, s"bucket count must be positive, got $n")
    val era = Era("e0", s"bucket:$n", "-")
    writeBucketEra(df, keyCol, root, era)
    writeEras(df.sparkSession, root, Seq(era))
  }

  /** BUCKET-COUNT EVOLUTION: the table outgrew its bucket count —
    * switch to `newN` as one metadata line; history stays in place.
    */
  def evolveBucketCount(spark: SparkSession, root: String, newN: Int): Unit = {
    val eras = readEras(spark, root)
    require(newN > 0, s"bucket count must be positive, got $newN")
    val curN = bucketCountOf(eras.last)
    require(curN != newN, s"layout $root already has $newN buckets")
    writeEras(spark, root, eras :+ Era(s"e${eras.size}", s"bucket:$newN", "-"))
  }

  private def bucketCountOf(era: Era): Int = {
    require(era.transform.startsWith("bucket:"),
      s"era ${era.dir} is not bucket-partitioned: ${era.transform}")
    era.transform.stripPrefix("bucket:").toInt
  }

  private def writeBucketEra(
      df: DataFrame, keyCol: String, root: String, era: Era): Unit = {
    val n = bucketCountOf(era)
    df.withColumn(BucketCol, pmod(hash(col(keyCol).cast("long")), lit(n)))
      .write.mode("append").partitionBy(BucketCol).parquet(s"$root/${era.dir}")
  }

  /** Append rows under the CURRENT era's bucket count. */
  def appendEvolvableBucketed(df: DataFrame, keyCol: String, root: String): Unit =
    writeBucketEra(df, keyCol, root,
      readEras(df.sparkSession, root).last)

  /** Equality probe across EVERY era: the probe's bucket is derived
    * PER ERA under that era's bucket count (the writer's own hash
    * expression, evaluated once per era on the literal), so each era
    * lists exactly one directory; the exact key predicate is the
    * residual on the union.
    */
  def readKeyEqualsEvolved(
      spark: SparkSession, root: String, keyCol: String, key: Long): DataFrame = {
    val eras = readEras(spark, root).filter(eraHasData(spark, root, _))
    require(eras.nonEmpty,
      s"evolvable layout $root holds no data yet in any era: nothing to serve")
    eras.map(era => // the ONE probe body — era arity must never drift
      readKeyEquals(spark, s"$root/${era.dir}", keyCol, key, bucketCountOf(era)))
      .reduce(_ unionByName _)
  }

  /** Range read across EVERY era: the day eras prune on derived date
    * literals, the hour eras on derived `yyyy-MM-dd-HH` string bounds
    * (both computed driver-side under each era's RECORDED zone, so both
    * predicates are foldable and prune at listing time), the exact ts
    * predicate is the residual on every era, and the union serves one
    * frame — the transform boundary is invisible to results. An
    * unparseable bound is a defined EMPTY result, like [[readTsRange]].
    */
  /** An era contributes to reads only once it HOLDS partition dirs:
    * evolveToHourly is metadata-only (the new era's directory does not
    * exist until its first append), and a zero-row append leaves a
    * dir with no partitions — both are legal states a range read must
    * treat as "this era has nothing yet", not crash on. Hadoop FS like
    * the rest of the sidecar plumbing, so remote roots work.
    */
  private def eraHasData(spark: SparkSession, root: String, era: Era): Boolean = {
    val d = new org.apache.hadoop.fs.Path(root, era.dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(d) &&
      fs.listStatus(d).exists(_.getPath.getName.startsWith("__p_"))
  }

  def readTsRangeEvolved(
      spark: SparkSession, root: String, tsCol: String,
      lo: String, hi: String): DataFrame = {
    val all = readEras(spark, root)
    val eras = all.filter(eraHasData(spark, root, _))
    require(eras.nonEmpty,
      s"evolvable layout $root holds no data yet in any era: nothing to serve")
    def eraRead(era: Era, loI: java.time.Instant, hiI: java.time.Instant): DataFrame = {
      val zone = java.time.ZoneId.of(era.zone)
      val raw = spark.read.parquet(s"$root/${era.dir}")
      era.transform match {
        case "day" =>
          def dayIn(i: java.time.Instant): java.sql.Date =
            java.sql.Date.valueOf(java.time.LocalDate.ofInstant(i, zone))
          raw.filter(col(DayCol).between(lit(dayIn(loI)), lit(dayIn(hiI))))
            .drop(DayCol)
        case "hour" =>
          val fmt = java.time.format.DateTimeFormatter.ofPattern(HourFmt)
            .withZone(zone)
          raw.filter(col(HourCol).between(lit(fmt.format(loI)), lit(fmt.format(hiI))))
            .drop(HourCol)
        case other => sys.error(s"unknown partition transform $other")
      }
    }
    (parseBound(spark, lo), parseBound(spark, hi)) match {
      case (Some(loI), Some(hiI)) =>
        eras.map { era =>
          eraRead(era, loI, hiI)
            .filter(col(tsCol) >= lit(lo).cast("timestamp") &&
              col(tsCol) < lit(hi).cast("timestamp"))
        }.reduce(_ unionByName _)
      case _ => // NULL bound: the residual matches nothing
        eraRead(eras.head, java.time.Instant.EPOCH, java.time.Instant.EPOCH)
          .filter(lit(false))
    }
  }
}
