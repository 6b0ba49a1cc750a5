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

  /** The manifest kernel over an arbitrary frame (a whole dir, or just
    * newly-appended files for [[extendManifest]]).
    */
  private def buildManifestFrom(
      data: DataFrame, keyCol: String,
      expectedPerFile: Long, fpp: Double): Seq[FileBloom] = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows: Dataset[(String, Long)] = data
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
      .collect()
      .map { case (f, b) => FileBloom(f, b) }
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
