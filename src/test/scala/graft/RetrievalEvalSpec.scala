package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Laws for the retrieval/ANN evaluation queries
  * (`x_retrieval_metrics`, `x_ann_recall`): the metric arithmetic
  * invariants, non-vacuousness on the gate corpus, and the full-probe
  * limit — an IVF probe that visits every cell must recover the exact
  * ranking (recall 1 by construction, not by luck).
  */
class RetrievalEvalSpec extends SparkSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x_retrieval_metrics: invariants hold and the metric is live") {
    val rows = run("x_retrieval_metrics").collect()
    assert(rows.length == 5) // one row per retrieval gate query
    rows.foreach { r =>
      val nRel   = r.getAs[Long]("n_rel")
      val hits   = r.getAs[Long]("hits_at_10")
      val recall = r.getAs[Double]("recall_at_10")
      val rr     = r.getAs[Double]("rr")
      assert(hits <= math.min(10L, nRel), s"hits $hits exceeds min(10, $nRel)")
      // rr = 0 exactly when nothing relevant was retrieved; otherwise
      // it is 1/rank of the first hit, rank ∈ [1, 10]
      assert((rr == 0.0) == (hits == 0L))
      if (hits > 0L) assert(rr >= 0.1 - 1e-9 && rr <= 1.0)
      val expect = if (nRel == 0L) 0.0 else round4(hits.toDouble / nRel)
      assert(recall == expect, s"recall $recall != $expect")
    }
    // non-vacuous: on the gate corpus at least one query retrieves a
    // relevant doc in its top-10 (labels share the bm25 vocabulary)
    assert(rows.exists(_.getAs[Long]("hits_at_10") > 0L))
  }

  test("x_ann_recall: bounds and arithmetic") {
    val rows = run("x_ann_recall").collect()
    assert(rows.length == 5) // every query has an exact top-10 to judge
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val nHit   = r.getAs[Long]("n_hit")
      val recall = r.getAs[Double]("recall_at_10")
      assert(nExact > 0L && nExact <= 10L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(recall == round4(nHit.toDouble / nExact))
    }
  }

  test("x_ann_recall_curve: monotone per query, exact endpoint, agrees with x_ann_recall") {
    val rows = run("x_ann_recall_curve").collect()
    assert(rows.length == 25) // 5 cutoffs × 5 queries
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (qid, qr) =>
      val curve = qr.sortBy(_.getAs[Int]("n_probe")).map(_.getAs[Long]("n_hit"))
      // widening the probe set only ever ADDS candidates: recall is
      // monotone non-decreasing in n_probe
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"query $qid recall curve not monotone: ${curve.mkString(",")}")
    }
    // n_probe = nCells probes every cell = brute force: recall 1
    rows.filter(_.getAs[Int]("n_probe") == 16).foreach { r =>
      assert(r.getAs[Double]("recall_at_10") == 1.0, s"endpoint recall != 1: $r")
    }
    // the n_probe = 4 slice IS x_ann_recall — one algebra, two surfaces
    val at4 = rows.filter(_.getAs[Int]("n_probe") == 4)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_hit"))).toMap
    run("x_ann_recall").collect().foreach { r =>
      assert(at4(r.getAs[Long]("query_id")) == r.getAs[Long]("n_hit"))
    }
  }

  test("ivfTopKCurve: the max-cutoff slice equals ivfTopK at that nProbe") {
    val e  = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = e.filter(col("vec_id") < 5)
    val slice = Similarity.ivfTopKCurve(e, qv, "vec_id", "embedding",
        k = 5, nCells = 16, probes = Seq(2, 6))
      .filter(col("n_probe") === 6)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
    val direct = Similarity.ivfTopK(e, qv, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 6)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
    assert(slice.exceptAll(direct).isEmpty && direct.exceptAll(slice).isEmpty)
  }

  test("s9_stream_metrics: metrics-at-ingest equals the batch judge") {
    val batch  = run("x_retrieval_metrics").collect().toSeq
    val stream = run("s9_stream_metrics").collect().toSeq
    assert(stream.map(_.toSeq) == batch.map(_.toSeq),
      s"stream metrics diverge from batch:\n  stream=$stream\n  batch=$batch")
  }

  test("x_ann_recall_pq: bounds and arithmetic") {
    val rows = run("x_ann_recall_pq").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val nHit   = r.getAs[Long]("n_hit")
      assert(nExact > 0L && nExact <= 10L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(r.getAs[Double]("recall_at_10") == round4(nHit.toDouble / nExact))
    }
    // the codes are lossy but not garbage: ADC keeps at least one
    // true top-10 neighbor per query on the gate corpus
    assert(rows.forall(_.getAs[Long]("n_hit") > 0L))
  }

  test("x_ann_recall: probing every cell recovers the exact ranking") {
    val e  = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = e.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(e, qv, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val full = Similarity.ivfTopK(e, qv, "vec_id", "embedding",
        k = 10, nCells = 16, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"))
    assert(exact.exceptAll(full).isEmpty, "exact hit missing from full probe")
    assert(full.exceptAll(exact).isEmpty, "full probe surfaced a non-exact hit")
  }

  test("bm25TopKPrf laws: fbTerms=0 degenerates to plain BM25; expansion is live and total") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val docs = GraftSession.table(spark, sf, "documents").select(col("doc_id"), col("text"))
    val qs = Seq((1L, "spark window agg"), (2L, "customer query data"),
      (3L, "vector nosuchterm merge")).toDF("query_id", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    // law: zero expansion terms ≡ the plain operator (pass 2 runs on
    // the unexpanded vocabulary, so the whole chain collapses)
    val plain = rows(TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 5))
    val zero  = rows(TextAnalysis.bm25TopKPrf(docs, "doc_id", "text", qs, "query_id", "qtext",
      k = 5, fbDocs = 5, fbTerms = 0))
    assert(zero === plain, "fbTerms=0 must reproduce plain BM25 exactly")
    // non-vacuous: with expansion on, at least one query's ranking or
    // scores move (the corpus vocabulary co-occurs — if nothing ever
    // changes the operator is dead weight)
    val prf = rows(TextAnalysis.bm25TopKPrf(docs, "doc_id", "text", qs, "query_id", "qtext",
      k = 5, fbDocs = 5, fbTerms = 3))
    assert(prf !== plain, "PRF expansion changed nothing on the gate corpus — vacuous")
    // determinism: replaying the chain is byte-identical (every stage
    // is rounded-decimal algebra with total tie-breaks)
    assert(rows(TextAnalysis.bm25TopKPrf(docs, "doc_id", "text", qs, "query_id", "qtext",
      k = 5, fbDocs = 5, fbTerms = 3)) === prf)
  }
}
