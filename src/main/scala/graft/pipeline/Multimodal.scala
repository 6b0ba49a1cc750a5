package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.rel.Queries.table

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * container — implemented as a deterministic fake (byte histogram over the
  * raw payload). Everything AROUND the stub is the real Spark shape a
  * production pipeline needs: binary column + metadata struct schema,
  * `mapPartitions` batch processing with one reusable buffer per partition
  * (the Scala analog of `mapInPandas` batch semantics), fixed-length
  * feature vectors, and partition-parallel execution with no driver
  * collect.
  */
object Multimodal {

  val FrameBytes = 64 // fake "frame" stride for frameSample
  val HistBins = 16

  final case class MediaRecord(
      doc_id: Long,
      media: Array[Byte], // opaque payload (here: UTF-8 of documents.text)
      width: Int,
      height: Int,
      format: String)

  final case class MediaFeature(
      doc_id: Long,
      media_len: Int,
      n_frames: Int,
      hist: Array[Double], // HistBins-normalized byte histogram (the stub "decode")
      feat_norm: Double)

  /** Build the media table from `documents`: payload = text bytes, typed
    * metadata derived deterministically (as an ingest step would carry
    * width/height/codec from the container format).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"),
        concat(lit("fake/"), pmod(col("doc_id"), lit(2)).cast("string")).as("format"))
      .as[MediaRecord]
  }

  /** "Decode" + feature-extract over the binary column. One histogram
    * buffer per partition, reused across records — the batch-shape
    * discipline that keeps per-record allocation off the hot path exactly
    * like an Arrow-batched `mapInPandas` would.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Long](HistBins)
      it.map { r =>
        java.util.Arrays.fill(hist, 0L)
        var i = 0
        while (i < r.media.length) {
          hist((r.media(i) & 0xFF) * HistBins / 256) += 1
          i += 1
        }
        val n = math.max(r.media.length, 1).toDouble
        val norm = hist.map(h => h / n)
        MediaFeature(
          r.doc_id,
          r.media.length,
          (r.media.length + FrameBytes - 1) / FrameBytes,
          norm,
          math.sqrt(norm.map(x => x * x).sum))
      }
    }
  }

  /** Frame sampling: every `stride`-th FrameBytes-sized slice of the
    * payload (the video-keyframe access pattern), emitted as
    * (doc_id, frame_no, frame bytes).
    */
  def frameSample(media: Dataset[MediaRecord], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media
      .flatMap { r =>
        val nFrames = (r.media.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames by stride).map { f =>
          val from = f * FrameBytes
          val until = math.min(from + FrameBytes, r.media.length)
          (r.doc_id, f, java.util.Arrays.copyOfRange(r.media, from, until))
        }
      }
      .toDF("doc_id", "frame_no", "frame")
  }

  /** Declared query: per-doc media features with the histogram rounded.
    * Oracle-gated: with [[HistBins]] = 16 the bin index is each byte's
    * high nibble, so DuckDB reproduces the histogram exactly from
    * `hex(encode(text))` — the byte-level features are hash-checked
    * cross-engine even though decode SEMANTICS stay stubbed.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, dir))
    feats
      .toDF()
      .select(
        col("doc_id"),
        col("media_len"),
        col("n_frames"),
        round(col("feat_norm"), 4).as("feat_norm"),
        round(element_at(col("hist"), 1), 4).as("hist_bin0"))
      .orderBy(col("doc_id"))
  }
}
