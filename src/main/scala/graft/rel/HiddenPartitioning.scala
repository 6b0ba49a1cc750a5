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

  /** Lay `df` out day-partitioned by the transform `day(tsCol)`. */
  def writeDayPartitioned(df: DataFrame, tsCol: String, dir: String): Unit =
    df.withColumn(DayCol, to_date(col(tsCol)))
      .write.partitionBy(DayCol).parquet(dir)

  /** Range read on the RAW timestamp — the day-partition predicate is
    * derived, the exact ts predicate re-applied as the residual.
    */
  def readTsRange(
      spark: SparkSession, dir: String, tsCol: String,
      lo: String, hi: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col(DayCol).between(
        to_date(lit(lo).cast("timestamp")), to_date(lit(hi).cast("timestamp"))))
      .filter(col(tsCol) >= lit(lo).cast("timestamp") &&
        col(tsCol) < lit(hi).cast("timestamp"))
      .drop(DayCol)

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
