package graft.rel

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** PER-FILE BLOOM-FILTER DATA SKIPPING — the point-lookup complement to
  * [[ZOrder]]'s min/max rectangles: min/max stats prune RANGE predicates
  * on the clustering columns, but an equality probe on a column the
  * layout was NOT sorted by (every file's min/max spans nearly the whole
  * domain) prunes nothing. A small bloom filter per file over that
  * column answers "can key k possibly live in this file?" in O(1) with
  * no file open — false positives cost an extra file read, never a
  * wrong row, and the residual filter keeps the result exact either way
  * (the same pure-optimization contract as [[ZOrder.prunedRead]]: the
  * DuckDB oracle recomputes the lookup from the raw table, so a file
  * wrongly skipped loses rows and goes red).
  *
  * Scale shape: the manifest build is ONE distributed pass — each input
  * partition folds its rows into per-file bloom partials locally
  * (`mapPartitions`, no row leaves the executor un-summarized), then one
  * shuffle of O(files × bloomBytes) partials merges them by bitwise OR
  * (blooms built with identical (n, fpp) geometry are closed under
  * union). Driver state is O(files) bloom blobs — KBs per file at 1%
  * fpp, the same bounded-manifest discipline as the snapshot commits.
  * At 100 TB this is exactly parquet's own column-index story lifted to
  * file granularity: the probe touches expectedHits/|files| of the data
  * instead of all of it.
  */
object BloomSkip {

  final case class FileBloom(file: String, bloom: Array[Byte])

  /** Build one bloom per data file of the parquet table at `dir` over
    * long column `keyCol`. `expectedPerFile` fixes the shared bloom
    * geometry (bits/hashes) so partials merge; size it to the write's
    * rows-per-file target.
    */
  def buildManifest(
      spark: SparkSession, dir: String, keyCol: String,
      expectedPerFile: Long, fpp: Double): Seq[FileBloom] =
    buildManifestFrom(spark.read.parquet(dir), keyCol, expectedPerFile, fpp)

  /** The distributed fold shared by both manifest forms: per-partition
    * bloom partials per file, merged by bitwise OR. NULL keys are
    * dropped BEFORE the fold — an equality probe can never match NULL,
    * so they contribute nothing to any bloom, and admitting them would
    * NPE the primitive decode. A file whose every key is null (or that
    * holds zero rows) therefore yields NO row here; both callers
    * complete coverage with an explicit EMPTY bloom for such files, so
    * every data file is always represented in the manifest — an
    * uncovered file would be silently skipped by the pruned read, the
    * one failure mode skipping must never have.
    */
  private def foldedBlooms(
      data: DataFrame, keyCol: String,
      expectedPerFile: Long, fpp: Double): Dataset[(String, Array[Byte])] = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows: Dataset[(String, Long)] = data
      .filter(col(keyCol).isNotNull)
      .select(input_file_name().as("file"), col(keyCol).cast("long").as("key"))
      .as[(String, Long)]
    rows.mapPartitions { it =>
      // local fold: one partial bloom per file seen by this partition
      val partials = scala.collection.mutable.HashMap.empty[String, BloomFilter]
      it.foreach { case (file, key) =>
        partials.getOrElseUpdate(file, BloomFilter.create(expectedPerFile, fpp))
          .putLong(key)
      }
      partials.iterator.map { case (f, b) => (f, serialize(b)) }
    }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val m = deserialize(a._2)
        m.mergeInPlace(deserialize(b._2))
        (a._1, serialize(m))
      }
      .map(_._2)
  }

  /** A bloom with nothing inserted — the explicit coverage marker for a
    * file with no indexable keys (mightContain is always false, so the
    * file is skipped CORRECTLY, by a covered decision, not by absence).
    */
  private def emptyBloom(expectedPerFile: Long, fpp: Double): Array[Byte] =
    serialize(BloomFilter.create(expectedPerFile, fpp))

  /** [[foldedBlooms]] for STRING keys — doc ids, URLs, content hashes:
    * the LLM-pipeline's natural point-lookup keys, which the long-keyed
    * fold cannot index (a cast would NULL them out). Same shape: NULL
    * keys dropped, per-partition partials, bitwise-OR merge;
    * `putString` hashes the UTF-8 bytes, exactly what
    * `mightContainString` probes.
    */
  private def foldedBloomsString(
      data: DataFrame, keyCol: String,
      expectedPerFile: Long, fpp: Double): Dataset[(String, Array[Byte])] = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows: Dataset[(String, String)] = data
      .filter(col(keyCol).isNotNull)
      .select(input_file_name().as("file"), col(keyCol).cast("string").as("key"))
      .as[(String, String)]
    rows.mapPartitions { it =>
      val partials = scala.collection.mutable.HashMap.empty[String, BloomFilter]
      it.foreach { case (file, key) =>
        partials.getOrElseUpdate(file, BloomFilter.create(expectedPerFile, fpp))
          .putString(key)
      }
      partials.iterator.map { case (f, b) => (f, serialize(b)) }
    }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val m = deserialize(a._2)
        m.mergeInPlace(deserialize(b._2))
        (a._1, serialize(m))
      }
      .map(_._2)
  }

  /** The manifest kernel over an arbitrary frame (a whole dir, or just
    * newly-appended files for [[extendManifest]]).
    */
  private def buildManifestFrom(
      data: DataFrame, keyCol: String,
      expectedPerFile: Long, fpp: Double): Seq[FileBloom] = {
    val folded = foldedBlooms(data, keyCol, expectedPerFile, fpp)
      .collect()
      .map { case (f, b) => FileBloom(f, b) }
    val covered = folded.map(_.file).toSet
    val empty = emptyBloom(expectedPerFile, fpp)
    (folded ++ data.inputFiles.filterNot(covered).map(FileBloom(_, empty)))
      .toSeq.sortBy(_.file)
  }

  /** INCREMENTAL index maintenance: fold into `manifest` blooms for the
    * files of `dir` it does not cover yet — O(new files), the covered
    * files' blooms are reused verbatim (data files are immutable in
    * every layout this engine writes, so a covered bloom can never go
    * stale). This is what keeps a per-file index affordable on a table
    * that grows by appends: each ingest batch indexes only itself.
    */
  def extendManifest(
      spark: SparkSession, manifest: Seq[FileBloom], dir: String,
      keyCol: String, expectedPerFile: Long, fpp: Double): Seq[FileBloom] = {
    val covered = manifest.map(_.file).toSet
    val newFiles = spark.read.parquet(dir).inputFiles.filterNot(covered)
    if (newFiles.isEmpty) manifest
    else (manifest ++ buildManifestFrom(
      spark.read.parquet(newFiles.toIndexedSeq: _*), keyCol, expectedPerFile, fpp))
      .sortBy(_.file)
  }

  // ---- TABLE-FORM manifest: the 100 TB shape ---------------------------
  //
  // At 10⁴ files a Seq[FileBloom] on the driver is fine; at 10⁶–10⁷
  // files (a 100 TB table) the manifest must be DATA, not driver state:
  // it lives as a parquet table keyed by file — (file STRING, bloom
  // BINARY) — built and extended by the same distributed fold, and the
  // skipping decision runs as a distributed probe over it. The driver
  // never deserializes a bloom; it receives only the surviving file
  // names (bounded by the probe's selectivity — the list the scan
  // planner needs anyway).

  /** Build the manifest TABLE for the parquet table at `dir`: one
    * distributed fold, written straight to `manifestDir` — no bloom
    * ever reaches the driver. Coverage completion (empty blooms for
    * files with no indexable keys) runs as a distributed anti-join
    * against the just-written manifest.
    */
  def buildManifestTable(
      spark: SparkSession, dir: String, keyCol: String,
      expectedPerFile: Long, fpp: Double, manifestDir: String): Unit = {
    // a re-build over an existing manifest would append DUPLICATE rows
    // per file (one admitting row each → the pruned read opens the file
    // twice and silently duplicates its rows); refuse — rebuilding means
    // a fresh manifestDir, growth means [[extendManifestTable]]
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(p),
      s"manifest table $manifestDir already exists: use extendManifestTable " +
        "to index new files, or build into a fresh directory")
    indexFilesInto(spark, spark.read.parquet(dir).inputFiles.toIndexedSeq,
      keyCol, expectedPerFile, fpp, manifestDir)
  }

  /** INCREMENTAL table-form maintenance: index only the files of `dir`
    * the manifest table does not cover yet — O(new files) work appended
    * to `manifestDir`; covered rows are immutable and never rewritten
    * (data files are immutable in every layout this engine writes, so a
    * covered bloom can never go stale). The new-file discovery is a
    * distributed anti-join of the directory listing against the
    * manifest's key column.
    */
  def extendManifestTable(
      spark: SparkSession, manifestDir: String, dir: String,
      keyCol: String, expectedPerFile: Long, fpp: Double): Unit = {
    import spark.implicits._
    val listing = spark.read.parquet(dir).inputFiles.toIndexedSeq
    val newFiles = listing.toDF("file")
      .join(spark.read.parquet(manifestDir).select("file"), Seq("file"), "left_anti")
      .as[String].collect().toIndexedSeq
    indexFilesInto(spark, newFiles, keyCol, expectedPerFile, fpp, manifestDir)
  }

  /** Index exactly `files` into the manifest table: the distributed
    * fold appended to `manifestDir`, then coverage-completed so each of
    * `files` has a row even when it contributed no keys.
    */
  private def indexFilesInto(
      spark: SparkSession, files: Seq[String], keyCol: String,
      expectedPerFile: Long, fpp: Double, manifestDir: String): Unit =
    indexFilesWith(spark, files, expectedPerFile, fpp, manifestDir)(
      foldedBlooms(_, keyCol, expectedPerFile, fpp))

  /** The ONE index-and-cover kernel both key types share. */
  private def indexFilesWith(
      spark: SparkSession, files: Seq[String],
      expectedPerFile: Long, fpp: Double, manifestDir: String)(
      fold: DataFrame => Dataset[(String, Array[Byte])]): Unit = {
    if (files.isEmpty) return
    import spark.implicits._
    fold(spark.read.parquet(files: _*))
      .toDF("file", "bloom")
      .write.mode("append").parquet(manifestDir)
    val uncovered = files.toDF("file")
      .join(spark.read.parquet(manifestDir).select("file"), Seq("file"), "left_anti")
    if (!uncovered.isEmpty)
      uncovered.withColumn("bloom", lit(emptyBloom(expectedPerFile, fpp)))
        .write.mode("append").parquet(manifestDir)
  }

  // ---- STRING-KEYED table-form manifest ---------------------------------

  /** [[buildManifestTable]] over a STRING key column. */
  def buildManifestTableString(
      spark: SparkSession, dir: String, keyCol: String,
      expectedPerFile: Long, fpp: Double, manifestDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(p),
      s"manifest table $manifestDir already exists: use " +
        "extendManifestTableString to index new files, or build into a " +
        "fresh directory")
    indexFilesWith(spark, spark.read.parquet(dir).inputFiles.toIndexedSeq,
      expectedPerFile, fpp, manifestDir)(
      foldedBloomsString(_, keyCol, expectedPerFile, fpp))
  }

  /** [[extendManifestTable]] over a STRING key column. */
  def extendManifestTableString(
      spark: SparkSession, manifestDir: String, dir: String,
      keyCol: String, expectedPerFile: Long, fpp: Double): Unit = {
    import spark.implicits._
    val newFiles = spark.read.parquet(dir).inputFiles.toSeq.toDF("file")
      .join(spark.read.parquet(manifestDir).select("file"), Seq("file"), "left_anti")
      .as[String].collect().toIndexedSeq
    indexFilesWith(spark, newFiles, expectedPerFile, fpp, manifestDir)(
      foldedBloomsString(_, keyCol, expectedPerFile, fpp))
  }

  /** [[candidateFiles]] for STRING probes (`mightContainString`). */
  def candidateFilesString(
      spark: SparkSession, manifestDir: String, keys: Seq[String]): DataFrame = {
    val ks = keys.toArray
    val admitsAny = udf { bloom: Array[Byte] =>
      val b = deserialize(bloom)
      ks.exists(b.mightContainString)
    }
    spark.read.parquet(manifestDir).filter(admitsAny(col("bloom")))
      .select("file").distinct()
  }

  /** Point/IN-list lookup on a STRING key through the table-form
    * manifest: distributed pruning decision, then open ONLY the
    * surviving files with the exact predicate as the residual.
    */
  def prunedReadTableString(
      spark: SparkSession, manifestDir: String, keyCol: String,
      keys: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = candidateFilesString(spark, manifestDir, keys)
      .as[String].collect().toIndexedSeq.sorted
    if (files.isEmpty) emptyFromManifest(spark, manifestDir, "indexed")
    else spark.read.parquet(files: _*)
      .filter(col(keyCol).isin(keys: _*))
  }

  /** The skipping decision as a DISTRIBUTED frame over the manifest
    * table — a broadcast semi-probe: the (small) key set ships with the
    * task closure, each executor deserializes only ITS partition's
    * blooms (once per file), and only admitting file names flow out.
    * Returned un-collected so callers can compose or plan-pin it; the
    * plan is a parquet scan of `manifestDir` + a filter — pruning is a
    * Spark job, not a driver loop.
    */
  def candidateFiles(
      spark: SparkSession, manifestDir: String, keys: Seq[Long]): DataFrame = {
    val ks = keys.toArray
    val admitsAny = udf { bloom: Array[Byte] =>
      val b = deserialize(bloom)
      ks.exists(b.mightContainLong)
    }
    // distinct: one OPEN per surviving file even if the manifest ever
    // holds two rows for it (a retried out-of-band append) — a duplicate
    // row must cost at most a redundant bloom probe, never duplicate the
    // pruned read's output rows
    spark.read.parquet(manifestDir).filter(admitsAny(col("bloom")))
      .select("file").distinct()
  }

  /** [[candidateFiles]] collected — only the survivors reach the driver. */
  def candidatesTable(
      spark: SparkSession, manifestDir: String, keys: Seq[Long]): Seq[String] = {
    import spark.implicits._
    candidateFiles(spark, manifestDir, keys).as[String].collect()
      .toIndexedSeq.sorted
  }

  /** Point/IN-list lookup through the table-form manifest: distributed
    * pruning decision, then open ONLY the surviving files with the
    * exact predicate as the residual filter.
    */
  /** Typed empty frame in the table's schema, sourced from one
    * manifest-listed file — the legal zero-survivors result, shared by
    * every table-form pruned read (bloom and z-order).
    */
  private[rel] def emptyFromManifest(
      spark: SparkSession, manifestDir: String, what: String): DataFrame = {
    import spark.implicits._
    val any = spark.read.parquet(manifestDir).select("file").as[String].head(1)
    require(any.nonEmpty, s"empty manifest table: table was never $what")
    spark.read.parquet(any.head).filter(lit(false))
  }

  def prunedReadTable(
      spark: SparkSession, manifestDir: String, keyCol: String,
      keys: Seq[Long]): DataFrame = {
    val files = candidatesTable(spark, manifestDir, keys)
    if (files.isEmpty) emptyFromManifest(spark, manifestDir, "indexed")
    else spark.read.parquet(files: _*)
      .filter(col(keyCol).isin(keys: _*))
  }

  /** [[dfpJoin]] through the table-form manifest: dim keys collected
    * under the same cap, the file-skipping decision run distributed.
    */
  def dfpJoinTable(
      spark: SparkSession, factDir: String, manifestDir: String,
      factKeyCol: String, dim: DataFrame, dimKeyCol: String,
      maxKeys: Int = 4096): DataFrame = {
    import spark.implicits._
    val keyRows = dim.select(col(dimKeyCol).cast("long"))
      .filter(col(dimKeyCol).isNotNull).distinct()
      .limit(maxKeys + 1).collect()
    val fact =
      if (keyRows.length > maxKeys) spark.read.parquet(factDir) // dim too big: no DFP
      else {
        val keys = keyRows.map(_.getLong(0)).toSeq
        val files = candidatesTable(spark, manifestDir, keys)
        if (files.isEmpty) emptyFromManifest(spark, manifestDir, "indexed")
        else spark.read.parquet(files: _*)
      }
    fact.join(broadcast(dim), fact(factKeyCol) === dim(dimKeyCol))
  }

  /** The files whose bloom admits ANY of `keys` — the skipping decision;
    * false positives only cost a file read.
    */
  def candidates(manifest: Seq[FileBloom], keys: Seq[Long]): Seq[String] =
    manifest.filter { fb =>
      val b = deserialize(fb.bloom)
      keys.exists(b.mightContainLong)
    }.map(_.file)

  /** Point/IN-list lookup: open ONLY the bloom-positive files, then
    * apply the exact predicate as the residual filter (absorbing the
    * false positives).
    */
  def prunedRead(
      spark: SparkSession, manifest: Seq[FileBloom],
      keyCol: String, keys: Seq[Long]): DataFrame = {
    require(manifest.nonEmpty, "empty bloom manifest: table was never indexed")
    val files = candidates(manifest, keys)
    if (files.isEmpty)
      spark.read.parquet(manifest.head.file).filter(lit(false))
    else spark.read.parquet(files: _*)
      .filter(col(keyCol).isin(keys: _*))
  }

  /** DYNAMIC FILE PRUNING JOIN — the manifest driving a JOIN instead of
    * a literal IN-list: when the dim side is selective, collect its
    * join keys at runtime (cap-guarded), skip every fact file whose
    * bloom admits none of them, and broadcast-join only the survivors.
    * This is the lakehouse "DFP" pattern: the fact scan cost tracks the
    * DIM's selectivity, not the fact's size. Above `maxKeys` the
    * operator falls back to the plain broadcast join over all files —
    * pruning is a pure optimization, never a semantics change (the
    * suite pins fallback == pruned == plain).
    */
  def dfpJoin(
      spark: SparkSession, factDir: String, manifest: Seq[FileBloom],
      factKeyCol: String, dim: DataFrame, dimKeyCol: String,
      maxKeys: Int = 4096): DataFrame = {
    require(manifest.nonEmpty, "empty bloom manifest: table was never indexed")
    // null dim keys can never match the equi-join — drop them before the
    // collect (a null would NPE the primitive unbox, and admitting it to
    // candidates() would be meaningless)
    val keyRows = dim.select(col(dimKeyCol).cast("long"))
      .filter(col(dimKeyCol).isNotNull).distinct()
      .limit(maxKeys + 1).collect()
    val fact =
      if (keyRows.length > maxKeys) spark.read.parquet(factDir) // dim too big: no DFP
      else {
        val keys = keyRows.map(_.getLong(0)).toSeq
        val files = candidates(manifest, keys)
        if (files.isEmpty) spark.read.parquet(manifest.head.file).filter(lit(false))
        else spark.read.parquet(files: _*)
      }
    fact.join(broadcast(dim), fact(factKeyCol) === dim(dimKeyCol))
  }

  private def serialize(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  private def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
