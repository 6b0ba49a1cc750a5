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
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    Option(Cast(Literal(s), org.apache.spark.sql.types.TimestampType,
      Some(sessionZone(spark))).eval(null))
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
}
