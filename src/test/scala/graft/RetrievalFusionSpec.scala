package graft

import graft.ops.Retrieval
import graft.scorer.MockRelevanceScorer

/** Laws of the shared hybrid-fusion tail (`Retrieval.rrfFuseRerank`)
  * — the one code path behind the inline, serving-path and streaming
  * fusion surfaces. The oracle rows gate the composed output on real
  * data; this spec pins the tail's algebraic edges the gate corpus
  * may not exercise: empty-leg degradation (an OOV query with zero
  * lexical hits must still rank on the dense leg alone, and vice
  * versa), the full-outer union semantics, and determinism under
  * repartitioning.
  */
class RetrievalFusionSpec extends SparkSpecBase {
  import spark.implicits._

  private def queries = Seq((1L, "alpha"), (2L, "beta")).toDF("query_id", "qtext")
  private def docs = Seq(
    (10L, "alpha body"), (11L, "alpha more"), (12L, "beta body"), (13L, "gamma")
  ).toDF("doc_id", "text")

  test("empty lexical leg degrades to dense-only ranking (and vice versa)") {
    // query 1 has ONLY dense hits, query 2 ONLY lexical hits
    val lex = Seq((2L, 12L, 1)).toDF("query_id", "doc_id", "lex_rank")
    val dense = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "dense_rank")
    val out = Retrieval.rrfFuseRerank(lex, dense, queries, "query_id", "qtext",
        docs, "doc_id", "text", new MockRelevanceScorer)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("lex_rank"), r.getAs[Int]("dense_rank")))
    // query 1: both dense docs survive, lex_rank coalesced to 0
    assert(out.filter(_._1 == 1L).map(_._2).toSet === Set(10L, 11L))
    assert(out.filter(_._1 == 1L).forall(_._3 == 0), "missing lex leg must coalesce to 0")
    // query 2: the lexical doc survives, dense_rank coalesced to 0
    assert(out.filter(_._1 == 2L).map(_._2).toSet === Set(12L))
    assert(out.filter(_._1 == 2L).forall(_._4 == 0), "missing dense leg must coalesce to 0")
  }

  test("a doc on BOTH legs outranks single-leg docs at equal ranks; fused output is deterministic") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "lex_rank")
    val dense = Seq((1L, 10L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "dense_rank")
    def run(lexIn: org.apache.spark.sql.DataFrame, denseIn: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuseRerank(lexIn, denseIn, queries, "query_id", "qtext",
        docs, "doc_id", "text", new MockRelevanceScorer)
    val rows = run(lex, dense).collect()
    // doc 10 carries two RRF terms (1/61 + 1/61) vs one each for 11/12
    val rrfOf = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(rrfOf(10L) > rrfOf(11L) && rrfOf(10L) > rrfOf(12L),
      s"two-leg doc must out-fuse single-leg docs: $rrfOf")
    // determinism under repartitioning — the DetHash/total-order guarantee
    val re = run(lex.repartition(7), dense.repartition(5)).collect()
    assert(re.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }
}
