package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ ROW-LEVEL DELETES (deletion vectors) — the lakehouse
  * answer to "DELETE 0.1% of rows from a 100 TB table" without the
  * copy-on-write rewrite of every touched file: a delete marks rows as
  * dead in a tiny sidecar keyed by (data file, row position) and leaves
  * every data byte in place; readers subtract the sidecar on the fly;
  * a later compaction ([[vacuum]]) folds the vectors into a physical
  * rewrite when the dead fraction justifies it. Delta's deletion
  * vectors and Iceberg's position-delete files are exactly this shape.
  *
  * Row identity comes from Spark's file-source metadata columns
  * (`_metadata.file_path`, `_metadata.row_index`) — stable positions
  * the scan produces for free, no synthetic key column needed.
  *
  * Scale shape: [[markDeletes]] is one predicate scan emitting only the
  * matched positions (O(deleted) sidecar bytes, appended — batches
  * compose by union and re-deleting a dead row is a no-op under the
  * anti-join). [[read]] BROADCASTS the vectors and anti-joins on
  * position, so the data side keeps ZERO Exchange — the plan is scan →
  * BroadcastHashJoin(LeftAnti), pinned in DeleteVectorsSuite. That
  * holds while vectors are delete-sized (MBs–GBs per batch); once the
  * dead fraction is large enough that broadcasting hurts, the right
  * move is not a shuffle join but [[vacuum]] — which is also the
  * existing compaction discipline (q183) applied here.
  */
object DeleteVectors {

  /** Append one delete batch: positions of rows in `dir` matching
    * `predicate` are written to the `dvDir` sidecar. The data files are
    * NOT touched (byte-identity pinned in the suite).
    */
  def markDeletes(
      spark: SparkSession, dir: String, predicate: Column, dvDir: String): Unit =
    spark.read.parquet(dir)
      .filter(predicate)
      .select(
        col("_metadata.file_path").as("__dv_file"),
        col("_metadata.row_index").as("__dv_pos"))
      .write.mode("append").parquet(dvDir)

  /** Path existence through the Hadoop FileSystem of the PATH (not
    * java.io.File, which silently answers false for hdfs://, s3a://, …
    * and would resurface every tombstoned row on a non-local store).
    */
  private def pathExists(spark: SparkSession, dvDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dvDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Merge-on-read scan: the table minus every position any delete
    * batch has marked. The vectors broadcast; the data side plans with
    * no Exchange.
    */
  def read(spark: SparkSession, dir: String, dvDir: String): DataFrame = {
    val data = spark.read.parquet(dir)
    if (!pathExists(spark, dvDir)) data
    else {
      val dv = spark.read.parquet(dvDir).distinct()
      val cols = data.columns.map(col).toSeq
      data
        .withColumn("__dv_file", col("_metadata.file_path"))
        .withColumn("__dv_pos", col("_metadata.row_index"))
        .join(broadcast(dv), Seq("__dv_file", "__dv_pos"), "left_anti")
        .select(cols: _*)
    }
  }

  /** Fold the vectors into a physical rewrite at `outDir` (the
    * copy-on-write moment, deferred until the dead fraction earns it)
    * and return the fresh table — read back with no sidecar.
    */
  def vacuum(
      spark: SparkSession, dir: String, dvDir: String, outDir: String,
      numFiles: Int): DataFrame = {
    read(spark, dir, dvDir).repartition(numFiles).write.parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Key-addressed delete batch: mark every row of `dir` whose key
    * tuple appears in `keys` (broadcast semi-join — the key set is a
    * batch, the table is the 100 TB side; zero Exchange on the data
    * scan). Shares [[read]]'s sidecar format — positions are absolute
    * file paths, so one `dvDir` can cover several data regions.
    */
  def markDeletesByKeys(
      spark: SparkSession, dir: String, keys: DataFrame, dvDir: String): Unit = {
    val keyCols = keys.columns.toSeq
    spark.read.parquet(dir)
      .withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
      .join(broadcast(keys.distinct()), keyCols, "left_semi")
      .select(col("__dv_file"), col("__dv_pos"))
      .write.mode("append").parquet(dvDir)
  }

  /** MERGE-ON-READ UPSERT — latest-wins by key, no data rewrite: rows of
    * `updates` whose key exists anywhere (base OR an earlier upsert's
    * appends) get the existing version tombstoned by position, then the
    * batch lands as new append files. Inserts are the same path with
    * nothing to tombstone. Base files are immutable forever; append
    * files are immutable once written (a LATER batch tombstones their
    * rows positionally, never rewrites them) — so every batch costs
    * O(|batch|) new bytes + O(matched) sidecar rows, the Delta/Iceberg
    * MoR upsert cost model.
    */
  def upsert(
      spark: SparkSession, baseDir: String, appendsDir: String, dvDir: String,
      updates: DataFrame, keyCols: Seq[String]): Unit = {
    val keys = updates.select(keyCols.map(col): _*)
    markDeletesByKeys(spark, baseDir, keys, dvDir)
    if (pathExists(spark, appendsDir))
      markDeletesByKeys(spark, appendsDir, keys, dvDir)
    updates.write.mode("append").parquet(appendsDir)
  }

  /** Merge-on-read scan of an upserted table: live base rows ∪ live
    * append rows (one shared sidecar masks both regions).
    */
  def readMor(
      spark: SparkSession, baseDir: String, appendsDir: String,
      dvDir: String): DataFrame = {
    val base = read(spark, baseDir, dvDir)
    if (!pathExists(spark, appendsDir)) base
    else base.unionByName(read(spark, appendsDir, dvDir))
  }
}
