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
  * matched positions (O(deleted) sidecar bytes, appended). Marking
  * always runs over the LIVE view, so a position is tombstoned at most
  * once ever — the invariant [[changes]] needs to reconstruct exact
  * per-batch pre-images. [[read]] BROADCASTS the vectors and anti-joins
  * on position, so the data side keeps ZERO Exchange — the plan is scan
  * → BroadcastHashJoin(LeftAnti), pinned in DeleteVectorsSuite. That
  * holds while vectors are delete-sized (MBs–GBs per batch); once the
  * sidecar outgrows `spark.graft.mor.broadcastMaxBytes` the subtract
  * falls back to a shuffled hash anti-join automatically (the rail —
  * an executor OOM is never the failure mode), and the right durable
  * move is [[vacuum]] — the existing compaction discipline (q183)
  * applied here.
  *
  * Every mutation carries a `batchId`, which buys the CHANGE DATA FEED
  * for free: [[changes]] replays any batch's exact row-level effect
  * (insert / update_pre / update_post / delete) from the batch's own
  * sidecar rows + append files in O(|batch|) — pre-images are read by
  * opening ONLY the files the batch's tombstones name, never by
  * diffing table states.
  */
object DeleteVectors {

  /** Size rail on the sidecar broadcast, mirroring the as-of join's
    * `spark.graft.asof.broadcastMaxBytes`: while the sidecar's on-disk
    * bytes stay at or under this threshold (default 512 MiB — deletes
    * are delete-sized, so this is a generous OOM bound, not the 10 MB
    * auto threshold), the subtract broadcasts and the data side keeps
    * ZERO Exchange. Above it — a high dead fraction that outgrew its
    * compaction — the subtract falls back to a SHUFFLED hash anti-join
    * on (file, pos): one Exchange on each side, but the tombstones
    * build the hash table and the data side streams, so the 100 TB
    * side is never sorted or collected. Semantics are identical across
    * tiers; only the physical plan changes (DeleteVectorsSuite pins
    * both). The gate reads the DIRECTORY's bytes (cheap driver-side
    * listing), not plan statistics — the sidecar is a concrete path,
    * so its size is exact, at the cost of comparing compressed bytes
    * against an in-memory bound (the 512 MiB default leaves headroom
    * for parquet decompression).
    */
  private def morBroadcastMaxBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.mor.broadcastMaxBytes")
      .map(_.toLong).getOrElse(512L << 20)

  /** Total on-disk bytes under `dir` (0 if absent). */
  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  /** The tombstone subtract — the ONE kernel every MoR read goes
    * through: anti-join `data` against the distinct (file, pos) set,
    * broadcast under the rail, shuffled-hash above it.
    */
  private def subtractTombstones(
      spark: SparkSession, data: DataFrame, dv: DataFrame,
      dvDir: String): DataFrame = {
    val positions = dv.select("__dv_file", "__dv_pos").distinct()
    if (dirBytes(spark, dvDir) <= morBroadcastMaxBytes(spark))
      data.join(broadcast(positions), Seq("__dv_file", "__dv_pos"), "left_anti")
    else
      data.join(positions.hint("shuffle_hash"),
        Seq("__dv_file", "__dv_pos"), "left_anti")
  }

  /** The live view of one data region WITH its position columns — the
    * shared kernel: data minus sidecar via [[subtractTombstones]]. With
    * `maxBatch`, only tombstones from batches ≤ that horizon are
    * subtracted — the time-travel half of [[readMorAsOf]].
    */
  private def liveWithPositions(
      spark: SparkSession, dir: String, dvDir: String,
      maxBatch: Option[Long] = None): DataFrame = {
    val data = spark.read.parquet(dir)
      .withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    if (!pathExists(spark, dvDir)) data
    else {
      val dv = maxBatch.foldLeft(spark.read.parquet(dvDir))(
        (d, m) => d.filter(col("__dv_batch") <= m))
      subtractTombstones(spark, data, dv, dvDir)
    }
  }

  /** Append one delete batch: positions of LIVE rows in `dir` matching
    * `predicate` are written to the `dvDir` sidecar tagged with
    * `batchId`. The data files are NOT touched (byte-identity pinned in
    * the suite); marking the live view (not the raw files) keeps the
    * tombstoned-at-most-once invariant, so re-deleting a dead row is a
    * true no-op even at the sidecar level.
    */
  def markDeletes(
      spark: SparkSession, dir: String, predicate: Column, dvDir: String,
      batchId: Long = 1L): Unit =
    liveWithPositions(spark, dir, dvDir)
      .filter(predicate)
      .select(col("__dv_file"), col("__dv_pos"), lit(batchId).as("__dv_batch"))
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
    val cols = spark.read.parquet(dir).columns.map(col).toSeq
    liveWithPositions(spark, dir, dvDir).select(cols: _*)
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

  /** Compact the WHOLE MoR table — live base rows ∪ live append rows —
    * into a fresh single-region table at `outDir` (no sidecar needed to
    * read it). The copy-on-write moment for an upserted table: run it
    * when accumulated tombstones/appends make the broadcast-subtract
    * read tax no longer worth deferring. Content-neutral by contract —
    * q196 gates it against the same oracle as the merge-on-read state.
    */
  def compactAll(
      spark: SparkSession, baseDir: String, appendsDir: String, dvDir: String,
      outDir: String, numFiles: Int): DataFrame = {
    readMor(spark, baseDir, appendsDir, dvDir)
      .repartition(numFiles).write.parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Key-addressed delete batch: mark every LIVE row of `dir` whose key
    * tuple appears in `keys` (broadcast semi-join — the key set is a
    * batch, the table is the 100 TB side; zero Exchange on the data
    * scan). Shares [[read]]'s sidecar format — positions are absolute
    * file paths, so one `dvDir` can cover several data regions.
    */
  def markDeletesByKeys(
      spark: SparkSession, dir: String, keys: DataFrame, dvDir: String,
      batchId: Long = 1L): Unit = {
    val keyCols = keys.columns.toSeq
    liveWithPositions(spark, dir, dvDir)
      .join(broadcast(keys.distinct()), keyCols, "left_semi")
      .select(col("__dv_file"), col("__dv_pos"), lit(batchId).as("__dv_batch"))
      .write.mode("append").parquet(dvDir)
  }

  /** MERGE-ON-READ UPSERT — latest-wins by key, no data rewrite: rows of
    * `updates` whose key exists anywhere (base OR an earlier upsert's
    * appends) get the LIVE version tombstoned by position, then the
    * batch lands as new append files tagged `__batch = batchId`. Inserts
    * are the same path with nothing to tombstone. Base files are
    * immutable forever; append files are immutable once written (a
    * LATER batch tombstones their rows positionally, never rewrites
    * them) — so every batch costs O(|batch|) new bytes + O(matched)
    * sidecar rows, the Delta/Iceberg MoR upsert cost model.
    *
    * `batchId` IDENTIFIES the batch (no default on purpose): re-invoking
    * with an already-applied id is a silent no-op — that is the replay
    * guard, not an error — so two DIFFERENT batches must carry two
    * different ids.
    */
  def upsert(
      spark: SparkSession, baseDir: String, appendsDir: String, dvDir: String,
      updates: DataFrame, keyCols: Seq[String], batchId: Long): Unit = {
    // replay guard (streaming foreachBatch is at-least-once): if this
    // batchId already landed its append files, the batch committed —
    // re-running it would tombstone its own first attempt's rows and
    // corrupt that batch's change feed. Tombstones-without-appends (a
    // crash between the two writes) replays safely: the live-view mark
    // finds the old versions already dead and marks nothing new.
    if (pathExists(spark, appendsDir) &&
      !spark.read.parquet(appendsDir)
        .filter(col("__batch") === batchId).isEmpty) return
    val keys = updates.select(keyCols.map(col): _*)
    markDeletesByKeys(spark, baseDir, keys, dvDir, batchId)
    if (pathExists(spark, appendsDir))
      markDeletesByKeys(spark, appendsDir, keys, dvDir, batchId)
    // appends are PARTITIONED by batch: changes() and the replay guard
    // filter on __batch, so directory pruning keeps both O(|batch|)
    // regardless of how many batches the table has accumulated
    updates.withColumn("__batch", lit(batchId))
      .write.mode("append").partitionBy("__batch").parquet(appendsDir)
  }

  /** Merge-on-read scan of an upserted table: live base rows ∪ live
    * append rows (one shared sidecar masks both regions) — the
    * unbounded-horizon case of [[readMorAsOf]], one kernel.
    */
  def readMor(
      spark: SparkSession, baseDir: String, appendsDir: String,
      dvDir: String): DataFrame =
    readMorAsOf(spark, baseDir, appendsDir, dvDir, Long.MaxValue)

  /** Live rows of an EXPLICIT FILE SET — the indexed-read path on a
    * mutable table: a bloom/min-max manifest picks the candidate files
    * (across base AND append regions — positions are absolute paths,
    * so one sidecar masks any mix), this subtracts the tombstones, the
    * caller applies its residual predicate. Lookup cost = candidate
    * files + the broadcast sidecar, independent of table size.
    */
  def readFilesLive(
      spark: SparkSession, files: Seq[String], dvDir: String): DataFrame = {
    require(files.nonEmpty, "empty candidate file set")
    val data = spark.read.parquet(files: _*)
      .withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    val live =
      if (!pathExists(spark, dvDir)) data
      else subtractTombstones(spark, data, spark.read.parquet(dvDir), dvDir)
    live.drop("__dv_file", "__dv_pos")
  }

  /** TIME TRAVEL by batch horizon — the table AS OF batch `maxBatch`,
    * reconstructed from the very same immutable artifacts every later
    * read uses: only tombstones from batches ≤ the horizon are
    * subtracted, only append batches ≤ the horizon are included.
    * Nothing is copied or checkpointed to make history readable — the
    * MoR layout IS its own history (base files immutable forever,
    * append batches immutable once written, tombstones append-only and
    * batch-tagged), which is why the horizon read costs the same as
    * the current read. Batch ids start at 1 by convention (the mark
    * defaults enforce it), so horizon 0 is the original base.
    */
  def readMorAsOf(
      spark: SparkSession, baseDir: String, appendsDir: String, dvDir: String,
      maxBatch: Long): DataFrame = {
    val baseCols = spark.read.parquet(baseDir).columns.map(col).toSeq
    val base = liveWithPositions(spark, baseDir, dvDir, Some(maxBatch))
      .select(baseCols: _*)
    if (!pathExists(spark, appendsDir)) base
    else base.unionByName(
      liveWithPositions(spark, appendsDir, dvDir, Some(maxBatch))
        .filter(col("__batch") <= maxBatch)
        .select(baseCols: _*))
  }

  /** CHANGE DATA FEED for one batch — the row-level effect of
    * `batchId`, reconstructed in O(|batch|) from the batch's own
    * artifacts, never by diffing table states:
    *
    *  - post-images = the batch's append rows (`__batch = batchId`);
    *  - pre-images = the rows at the positions the batch tombstoned —
    *    read by opening ONLY the data files those tombstones NAME (the
    *    file list is collected from the batch's sidecar rows, bounded
    *    by the batch size), then position-joined against the broadcast
    *    tombstone set;
    *  - ops: a pre-image whose key reappears in the post-images is
    *    `update_pre` (paired with `update_post`), otherwise `delete`;
    *    a post-image with no matching pre-image key is `insert`.
    *
    * Output = `op` ++ the table columns.
    */
  def changes(
      spark: SparkSession, baseDir: String, appendsDir: String, dvDir: String,
      batchId: Long, keyCols: Seq[String]): DataFrame = {
    val post =
      if (!pathExists(spark, appendsDir)) None
      else Some(spark.read.parquet(appendsDir)
        .filter(col("__batch") === batchId).drop("__batch")) // partition-pruned
      .filterNot(_.isEmpty)
    val tomb =
      if (!pathExists(spark, dvDir)) None
      else Some(spark.read.parquet(dvDir)
        .filter(col("__dv_batch") === batchId)
        .select("__dv_file", "__dv_pos"))
    val pre = tomb.map { t =>
      // file pruning: only the files the batch's tombstones name are
      // opened for pre-images — O(|batch|) driver state and scan cost
      val files = t.select("__dv_file").distinct().collect().map(_.getString(0))
      if (files.isEmpty) None
      // __batch lives in the append DIRECTORY layout, not in the files,
      // so by-path reads of both regions share one schema; mergeSchema
      // stays as a guard for any schema-evolved append batch
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(files.toIndexedSeq: _*)
        .withColumn("__dv_file", col("_metadata.file_path"))
        .withColumn("__dv_pos", col("_metadata.row_index"))
        .join(broadcast(t), Seq("__dv_file", "__dv_pos"), "left_semi")
        .drop("__dv_file", "__dv_pos")
        .drop("__batch")) // present when the pre-image came from appends
    }.flatten
    val keyCmp = keyCols.map(col)
    (pre, post) match {
      case (None, None) =>
        throw new IllegalArgumentException(s"batch $batchId left no artifacts")
      case (Some(p), None) =>
        p.select(lit("delete").as("op") +: p.columns.map(col): _*)
      case (None, Some(q)) =>
        q.select(lit("insert").as("op") +: q.columns.map(col): _*)
      case (Some(p), Some(q)) =>
        val postKeys = q.select(keyCmp: _*).distinct()
        val preKeys = p.select(keyCmp: _*).distinct()
        val preOps = p
          .join(broadcast(postKeys), keyCols, "left_semi")
          .select(lit("update_pre").as("op") +: p.columns.map(col): _*)
          .unionByName(p
            .join(broadcast(postKeys), keyCols, "left_anti")
            .select(lit("delete").as("op") +: p.columns.map(col): _*))
        val postOps = q
          .join(broadcast(preKeys), keyCols, "left_semi")
          .select(lit("update_post").as("op") +: q.columns.map(col): _*)
          .unionByName(q
            .join(broadcast(preKeys), keyCols, "left_anti")
            .select(lit("insert").as("op") +: q.columns.map(col): _*))
        preOps.unionByName(postOps)
    }
  }
}
