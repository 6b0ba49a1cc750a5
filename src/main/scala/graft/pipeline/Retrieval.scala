package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.rel.Queries.table

/** Hybrid retrieval: reciprocal-rank fusion (RRF — Cormack, Clarke &
  * Buettcher 2009) of the exact lexical BM25 ranking
  * ([[TextAnalysis.bm25]]) and an exact dense cosine ranking over the
  * `embeddings` table, for the same benchmark-query set. The standard
  * production shape for RAG / retrieval pipelines: run k-bounded
  * retrievers independently, fuse their TOP-K LISTS — never their raw
  * score scales — with rrf = Σ 1/(K + rank).
  */
object Retrieval {

  /** The standard RRF dampening constant from the original paper. */
  val RrfK = 60

  /** Results kept per query after fusion (matches [[TextAnalysis.Bm25TopK]]
    * so each retriever contributes a full candidate list).
    */
  val FusedTopK = 5

  /** L3/L4 — hybrid BM25 + dense fusion. Queries are the benchmark-source
    * documents (`Dedup.BenchSource`, as in q62); the dense side scores the
    * query document's embedding against every non-benchmark document that
    * HAS an embedding (at larger SFs `documents` outgrows `embeddings`,
    * so the retrievers genuinely cover different candidate universes —
    * exactly the situation RRF is designed for: fusion is over ranks, a
    * document missing from one list simply contributes 0 from it).
    *
    * Scale shape: both inputs are k-bounded rank lists — |queries| × k
    * rows each — so the fusion join, window, and sort are all over
    * bounded data no matter the corpus size. The dense ranking itself
    * broadcasts the bounded query side (the [[Similarity]] probe
    * pattern: each corpus vector is scored once per query in a broadcast
    * nested loop, no shuffle of the corpus) and selects per-query top-k
    * on the k-bounded [[graft.rel.TopK.topKPerGroup]] aggregator. The
    * BM25 side is the broadcast-query-map kernel plan of q62, reused
    * as-is. RRF terms 1/(K + rank) are exact binary rationals summed
    * pairwise (IEEE addition of two terms is order-free), so the fused
    * scores are bit-identical to the DuckDB oracle and the whole query
    * is hash-gated.
    */
  /** Phrase set size for [[phraseSearch]] — the q62/q107 MaxQueries
    * discipline: the phrase table is a fixed-size broadcast at any
    * corpus scale.
    */
  val PhraseCap = 8
  val PhraseSalt = "phrase:"
  val PhraseLen = 3

  /** L4 — PHRASE SEARCH over a POSITIONAL inverted index: the exact
    * multi-word matching primitive BM25's bag-of-words scoring cannot
    * express (BM25 scores "spark shuffle join" identically in any word
    * order; a phrase query requires ADJACENT positions). Index shape is
    * the production one: positional postings (token, doc, pos) — the
    * standing IR asset a deployment maintains — probed by a broadcast
    * phrase-word table. The intersection is the classic positional
    * algorithm made relational: each phrase word at offset `off`
    * matching a posting at `pos` votes for start `pos − off`, and a
    * start with ALL [[PhraseLen]] distinct offsets present is a phrase
    * occurrence (`count(distinct off) == len` also handles repeated
    * words in a phrase). Per-phrase doc counts aggregate from there.
    *
    * Phrases are the first [[PhraseLen]] words of [[Dedup.BenchSource]]
    * docs, capped at [[PhraseCap]] by salted-md5 order (mirrored by the
    * oracle), so the probe side is bounded while the postings side
    * scales with the corpus — one corpus-wide shuffle on the group key,
    * map-side partial counts. Hash-gated: the oracle recomputes each
    * count by space-padded substring containment, which on this
    * single-spaced corpus is EXACTLY token-sequence adjacency — so the
    * whole positional machinery must agree with a semantically
    * independent definition of "contains the phrase".
    */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val phrases = docs
      .filter(col("source") === Dedup.BenchSource)
      .withColumn("h",
        substring(md5(concat(lit(PhraseSalt), col("doc_id").cast("string"))), 1, 12))
      .filter(size(split(col("text"), " ")) >= PhraseLen)
      .orderBy(col("h"), col("doc_id"))
      .limit(PhraseCap)
      .select(array_join(slice(split(col("text"), " "), 1, PhraseLen), " ").as("phrase"))
      .distinct()
    val postings = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val phraseWords = phrases
      .select(col("phrase"), posexplode(split(col("phrase"), " ")).as(Seq("off", "w")))
    postings
      .join(broadcast(phraseWords), col("token") === col("w"))
      .groupBy(col("phrase"), col("doc_id"), (col("pos") - col("off")).as("start"))
      .agg(countDistinct(col("off")).as("nw"))
      .filter(col("nw") === PhraseLen)
      .groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("phrase"))
  }

  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lex = TextAnalysis.bm25(spark, dir)
      .select(col("q_id"), col("doc_id"), col("rnk").as("lex_rnk"))

    // dense ranking: embeddings joined to documents for source tags; the
    // join key vec_id == doc_id is the generator's alignment contract
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("source"))
    val emb = Similarity.vectors(spark, dir)
      .join(docs, col("vec_id") === col("doc_id"))
    val qs = broadcast(
      emb.filter(col("source") === Dedup.BenchSource
          && TextAnalysis.isBenchQuery(spark, dir, col("vec_id")))
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn")))
    val scored = emb.filter(col("source") =!= Dedup.BenchSource)
      .select(col("vec_id"), col("v"), col("norm"))
      .join(qs) // broadcast nested loop: |corpus| × |queries|, queries bounded
      .select(
        col("q_id"),
        (graft.functions.GraftFunctions.dotF64(col("qv"), col("v"))
          / (col("qn") * col("norm"))).as("cos"),
        col("vec_id"))
      .as[(Long, Double, Long)]
    val dense = graft.rel.TopK.topKPerGroup(scored, FusedTopK)
      .select(col("group").as("q_id"), col("id").as("doc_id"), col("rnk").as("dense_rnk"))

    // fusion: full outer on (q_id, doc_id) — a doc missing from one list
    // contributes 0 from it; absent ranks surface as 0 (never null, so
    // the fused frame is total and hash-stable)
    val fused = lex.join(dense, Seq("q_id", "doc_id"), "full_outer")
      .na.fill(0, Seq("lex_rnk", "dense_rnk"))
      .withColumn(
        "rrf",
        when(col("lex_rnk") > 0, lit(1.0) / (lit(RrfK) + col("lex_rnk"))).otherwise(lit(0.0))
          + when(col("dense_rnk") > 0, lit(1.0) / (lit(RrfK) + col("dense_rnk"))).otherwise(lit(0.0)))
    // ≤ 2k candidates per query by construction — the window sorts tiny
    // bounded groups, not corpus data
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= FusedTopK)
      .select(
        col("q_id"), col("rnk"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"), col("lex_rnk"), col("dense_rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }
}
