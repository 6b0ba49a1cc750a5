package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rel.Queries.table

/** Deduplication operators for a training-data pipeline: exact (L1), exact
  * n-gram Jaccard via an inverted-index self-join (L2 exact), MinHash + LSH
  * (L2 approximate, the 100 TB path), and SimHash banding.
  *
  * Scale posture: nothing here is all-pairs. The exact-Jaccard join fans out
  * by shingle (inverted index) so only documents sharing ≥1 shingle ever
  * meet; MinHash/SimHash band joins touch only bucket-colliding candidates.
  * All stages are shuffle-partitioned on their join keys — no collect, no
  * driver-side grouping, no crossJoin anywhere.
  */
object Dedup {

  /** L1 — exact dedup by normalized-text hash. Dup groups keyed by
    * `md5(lower(text))`; canonical member = min doc_id (deterministic).
    * At 100 TB this is one hash-partitioned aggregation over a 32-char key —
    * the cheapest possible dedup pass.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(md5(lower(col("text"))).as("text_hash"), col("doc_id"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_cnt"))
      .orderBy(col("text_hash"))

  /** Threshold above which two documents count as near-duplicates. The
    * testdata has planted dups at Jaccard ≈ 0.9–1.0 and background pairs
    * ≤ 0.1, so 0.5 separates with a wide margin on both sides.
    */
  val JaccardThreshold = 0.5

  /** Word-3-gram shingle sets per doc: (doc_id, shingles, n_shingles). */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)

  /** L2 exact — n-gram Jaccard near-dup pairs via inverted index:
    * explode shingles → self-join on shingle (hash-partitioned on the
    * shingle key) → count common shingles per pair → Jaccard =
    * |∩| / (|A|+|B|-|∩|) ≥ threshold. Exact answer, but only pairs that
    * share at least one shingle are ever materialized; with a stopword-ish
    * shingle blacklist (not needed on this corpus) this is the classic
    * scalable exact-join design.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(spark, dir)
    val inv = docs.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    val a = inv.select(col("doc_id").as("d1"), col("n_sh").as("n1"), col("s"))
    val b = inv.select(col("doc_id").as("d2"), col("n_sh").as("n2"), col("s"))
    a.join(b, a("s") === b("s") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Signature length K, banded as B bands × R rows (K = B*R). With
    * threshold t = 0.5 the S-curve midpoint (1/B)^(1/R) = (1/32)^(1/4) ≈
    * 0.42, so pairs at Jaccard ≥ 0.5 collide in ≥1 band with prob ≥ 0.96
    * while 0.1-background pairs almost never do.
    */
  val MinHashK = 128
  val MinHashBands = 32
  val MinHashRows = 4
  private val P = 2147483647L // 2^31-1 (prime): keeps a*h+b < 2^62, no ANSI overflow

  /** MinHash signature column over a pre-hashed shingle array `hs`
    * (array<long>): sig[i] = min over shingles of (a_i·h + b_i) mod P over
    * the field GF(P), P = 2^31−1. Both factors are first reduced mod P so
    * the product stays < 2^62 — Spark 4 runs ANSI mode by default and a
    * wrapping 64-bit multiply would throw ARITHMETIC_OVERFLOW. a_i ≠ 0 for
    * all i (P prime > K). Pure Catalyst `transform`/`array_min` — the
    * K×|shingles| evaluation happens inside codegen with zero shuffles.
    */
  private def minhashSig(hs: Column): Column =
    transform(
      sequence(lit(0), lit(MinHashK - 1)),
      i => {
        val a = pmod((i + 1) * lit(0x9E3779B9L), lit(P))
        val b = pmod(i * lit(0x85EBCA6BL) + lit(0xC2B2AE35L), lit(P))
        array_min(transform(hs, h => pmod(pmod(h, lit(P)) * a + b, lit(P))))
      }
    )

  /** L2 approximate — MinHash-LSH near-dup candidates, then exact-Jaccard
    * verification of candidates only. Emits the same shape as
    * [[ngramJaccard]]; on this corpus the banding parameters give ≈1.0
    * recall of the ≥0.5 pairs (asserted in PipelineSuite against the exact
    * result), while at 100 TB the band join touches only hash-bucket
    * collisions instead of every shingle co-occurrence.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(spark, dir)
      .withColumn("hs", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig", minhashSig(col("hs")))

    // Band key: (band index, xxhash64 of the band's R signature values).
    val banded = docs
      .select(
        col("doc_id"),
        col("sh"),
        col("n_sh"),
        explode(
          transform(
            sequence(lit(0), lit(MinHashBands - 1)),
            b =>
              struct(
                b.as("band"),
                xxhash64(b, array_join(slice(col("sig"), b * MinHashRows + 1, lit(MinHashRows)), ","))
                  .as("bkey")
              )
          )
        ).as("bk")
      )
      .select(col("doc_id"), col("sh"), col("n_sh"), col("bk.band"), col("bk.bkey"))

    val l = banded.select(
      col("band"), col("bkey"),
      col("doc_id").as("d1"), col("sh").as("sh1"), col("n_sh").as("n1"))
    val r = banded.select(
      col("band"), col("bkey"),
      col("doc_id").as("d2"), col("sh").as("sh2"), col("n_sh").as("n2"))

    l.join(r, Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("sh1"), col("sh2"), col("n1"), col("n2"))
      .dropDuplicates("d1", "d2") // a pair may collide in many bands
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("common") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** Hamming-distance cutoff for SimHash near-dup pairs. */
  val SimHashMaxHamming = 3

  /** 64-bit SimHash per doc: each token votes ±1 on every bit of its
    * xxhash64; bit j of the fingerprint is set iff the vote sum is
    * positive. Implemented as 64 conditional-sum aggregates — partial
    * (map-side) aggregation applies, so the shuffle carries 64 longs per
    * doc regardless of document length.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), explode(Shingles.tokens(col("text"))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$j")
    }
    val sig = (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
      acc.bitwiseOR(when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    }
    toks
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * chunks (pigeonhole: any pair within Hamming distance 3 agrees on at
    * least one chunk), join per chunk, verify `bit_count(xor) <= 3`.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = simhash(spark, dir)
    val banded = sigs.select(
      col("doc_id"),
      col("simhash"),
      explode(
        array((0 until 4).map { b =>
          struct(
            lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))
        }: _*)
      ).as("bk")
    ).select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.chunk"))

    val l = banded.select(col("band"), col("chunk"), col("doc_id").as("d1"), col("simhash").as("s1"))
    val r = banded.select(col("band"), col("chunk"), col("doc_id").as("d2"), col("simhash").as("s2"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("d1") < col("d2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= SimHashMaxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }
}
