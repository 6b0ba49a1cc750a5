package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no
  * code. Salting is the explicit fallback for the cases AQE can't fix:
  * a sort-merge join whose single hot key exceeds one task even after
  * splitting, or a pre-AQE engine. It trades `salts`× replication of the
  * build side for an even spread of the hot key across `salts` tasks.
  */
object Skew {

  /** Inner equi-join of a skewed `fact` against a (replicable) `build`
    * side: the fact rows scatter across `salts` sub-keys, the build side
    * is replicated once per sub-key, and the join key becomes
    * (key, salt) — so one hot key occupies `salts` shuffle partitions
    * instead of one. Row-level results are identical to
    * `fact.join(build, key)`.
    *
    * The salt is derived from `spark_partition_id` + a per-partition
    * counter rather than `rand()` so the result stays deterministic for
    * a given input partitioning.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = fact.withColumn(
      "__salt",
      pmod(hash(spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val replicated = build.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k most frequent join keys — the diagnostic used to decide
    * whether a key needs salting (one aggregation, no collect of data
    * rows).
    */
  def keyHistogram(df: DataFrame, key: Column, k: Int): DataFrame =
    df.groupBy(key).count().orderBy(col("count").desc).limit(k)

  /** [[keyHistogram]]-gated salting: measure the hottest key first (one
    * distributed aggregation; exactly ONE summary row reaches the driver)
    * and salt only when it exceeds `hotThreshold` rows — so well-behaved
    * keys skip the `salts`× build-side replication entirely and skewed
    * ones get spread before the shuffle melts a task. `hotThreshold`
    * should be sized to what one task comfortably processes (e.g. rows
    * amounting to a few× `spark.sql.files.maxPartitionBytes`).
    */
  def autoSaltedJoin(
      fact: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int,
      hotThreshold: Long): DataFrame = {
    val top = keyHistogram(fact, col(key), 1).collect()
    val isSkewed = top.nonEmpty && top(0).getLong(1) > hotThreshold
    if (isSkewed) saltedJoin(fact, build, key, salts)
    else fact.join(build, Seq(key))
  }
}
