package graft.rel

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located joins.
  *
  * A join between two tables bucketed AND sorted by the join key on the
  * same bucket count needs no shuffle and no sort at query time — the
  * sort-merge join reads co-located buckets directly. At 100 TB this is
  * the difference between re-shuffling the fact table for every join and
  * paying the partitioning cost once at write time. (Spark buckets with
  * Murmur3 on the key, matching `repartition`'s hash — any engine reading
  * the catalog entry sees the same layout.)
  */
object Bucketing {

  /** Writes `df` as a bucketed+sorted parquet table registered in the
    * session catalog (bucket metadata lives in the catalog, which is why
    * this goes through `saveAsTable` rather than a bare path write).
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Joins two same-bucketed catalog tables on their bucket key. With
    * matching bucket counts the plan contains no Exchange on either side
    * (asserted in BucketingSuite).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
