package graft.ops

import graft.scorer.RelevanceScorer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition shared by every fusion surface —
  * inline (`x_retrieval_fusion`), serving-path
  * (`x_retrieval_fusion_index`) and streaming (`s9_stream_fusion`):
  * reciprocal-rank fusion of a lexical and a dense recall leg, fused
  * top-`fuseK`, cross-encoder rerank through the Scorer seam, final
  * top-`outK`. ONE definition so the three surfaces cannot drift —
  * the same discipline as the ingest capstone's shared `ingestTail`.
  *
  * RRF is a fixed-order sum of exactly two IEEE terms
  * (1/(60+rank)), so given deterministic legs the whole composition
  * replays hash-exact in SQL. Scale shape: each leg arrives already
  * bounded (k rows per query from its own recall machinery — postings
  * buckets / IVF cells); the fusion full-outer join, windows, and
  * rerank touch ≤ 2k rows per query regardless of corpus size, and
  * the only corpus-sized input is the doc-text lookup join for the
  * reranker, an equi-join on the fused candidates' ids.
  */
object Retrieval {

  /** Injective 64-bit (query, doc) pair key for the scorer seam:
    * doc_id takes the low 32 bits, query_id the next 31 (r16 advice —
    * the old 10⁶ shift collided, or went negative, once doc_id ≥ 10⁶,
    * silently breaking the documented hash-exact replay for any
    * key-dependent scorer at web-scale ids). The domain is ASSERTED
    * inside the plan: `assert_true` returns NULL on pass, so the
    * coalesce keeps the key codegen'd while an out-of-range id fails
    * the job loudly instead of folding two pairs onto one key.
    */
  private val KeyShift = 4294967296L // 2^32
  private[graft] def pairKey(qid: Column, did: Column): Column = {
    val q = qid.cast("long")
    val d = did.cast("long")
    coalesce(
      assert_true(
        d >= 0 && d < lit(KeyShift) && q >= 0 && q < lit(2147483648L),
        lit("pair-key domain: need 0 <= doc_id < 2^32 and 0 <= query_id < 2^31")
      ).cast("long"),
      q * lit(KeyShift) + d)
  }

  /** `lex`: (query_id, doc_id, lex_rank); `dense`: (query_id, doc_id,
    * dense_rank); `queries`: (query_id, qtext); `docs`: (idCol,
    * textCol). Output: (query_id, rerank, doc_id, lex_rank,
    * dense_rank, rrf, ce_prob), total-ordered.
    */
  def rrfFuseRerank(
      lex: DataFrame, dense: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String,
      docs: DataFrame, idCol: String, textCol: String,
      scorer: RelevanceScorer,
      fuseK: Int = 10, outK: Int = 3, rrfK: Double = 60.0): DataFrame = {
    val rrf =
      when(col("lex_rank").isNotNull, lit(1.0) / (lit(rrfK) + col("lex_rank"))).otherwise(lit(0.0)) +
      when(col("dense_rank").isNotNull, lit(1.0) / (lit(rrfK) + col("dense_rank"))).otherwise(lit(0.0))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"),
        rrf.as("rrf"))
    val wF = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id").asc)
    val top = fused.withColumn("fuse_rank", row_number().over(wF))
      .filter(col("fuse_rank") <= fuseK)
    val pairs = top
      .join(queries.select(col(qidCol).as("query_id"), col(qtextCol).as("text")), "query_id")
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("text_b")), "doc_id")
      .select(col("query_id"), col("doc_id"), col("lex_rank"), col("dense_rank"), col("rrf"),
        col("text"), col("text_b"),
        pairKey(col("query_id"), col("doc_id")).as("key"))
    val scored = Relevance.scoreRelevance(pairs, scorer, "key")
    val w = Window.partitionBy(col("query_id")).orderBy(col("prob").desc, col("doc_id").asc)
    scored.withColumn("rerank", row_number().over(w)).filter(col("rerank") <= outK)
      .select(col("query_id"), col("rerank"), col("doc_id"),
        col("lex_rank"), col("dense_rank"), round(col("rrf"), 6).as("rrf"),
        round(col("prob"), 4).as("ce_prob"))
      .orderBy(col("query_id"), col("rerank"))
  }
}
