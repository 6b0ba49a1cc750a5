package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the engine's newline-text contract: CSV,
  * JSON-lines, and parquet with explicit schemas, plus a partitioned
  * parquet layout for partition-pruned scans.
  *
  * Scale rules baked in:
  *  - readers take an explicit [[StructType]] — `inferSchema` would scan
  *    100 TB once just to guess types (and JSON inference samples rows,
  *    so it can't even be trusted);
  *  - the partitioned writer lays data out hive-style (`k=v` dirs) so a
  *    filter on the partition column prunes whole directories at
  *    planning time (asserted in FormatsSuite via `PartitionFilters`).
  */
object Formats {

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently null
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC round-trip — same explicit-schema discipline as the other
    * formats; ORC ships in Spark core and carries predicate pushdown and
    * column pruning like parquet (FormatsSuite pins PushedFilters on the
    * ORC scan).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Size-bounded parquet shards — the output contract training-data
    * consumers want (a loader maps one shard to one worker, so shards
    * must be capped, not left to whatever a task happened to hold).
    * `maxRecordsPerFile` makes every task roll files at the cap; the
    * file COUNT still scales with parallelism, which is correct — a
    * single fixed file count would funnel 100 TB through few writers.
    */
  def writeSharded(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Hive-style partitioned parquet: one directory per distinct value of
    * `partitionCol`. Choose a column with bounded cardinality (a date, a
    * shard id) — per-key file counts are the classic small-files trap.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
