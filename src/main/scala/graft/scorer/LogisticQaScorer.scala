package graft.scorer

/** [[QaScorer]] backed by a *trained* model — the classical-ML
  * extractive-QA baseline: candidate answers are the token n-grams of
  * the context, each ranked by a trained logistic head scoring
  * P(answer | question ⊕ span), with FARM-shaped n-best output
  * (rank, answer, score, no-answer score + boost) so the whole
  * [[graft.ops.KpiPost]] chain runs unchanged on a real model
  * (reference: src/models/text_kpi_infer.py:180-232 — the transformer
  * span head's n-best dicts; same output contract, linear model).
  *
  * Determinism: spans are generated start-ascending / length-ascending
  * and ties in probability break by (start, length), so the n-best
  * list is independent of partition layout — the property every graft
  * operator guarantees.
  *
  * Scale shape: work per row is O(tokens × maxSpanTokens) scorer
  * calls, each O(span). `maxContextTokens` bounds the quadratic-ish
  * worst case the way FARM's max_seq_len does; the scorer runs inside
  * the same partition-batched `mapPartitions` as every other scorer,
  * so no driver involvement and no shuffle.
  */
final class LogisticQaScorer(
    rel: LogisticRelevanceScorer,
    nBest: Int = 2,
    maxSpanTokens: Int = 3,
    maxContextTokens: Int = 64,
    noAnsBoost: Double = -15.0
) extends QaScorer {

  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Seq[QaCandidate])] =
    batch.map { case (key, question, context) =>
      val toks = context.split(" ").filter(_.nonEmpty).take(maxContextTokens)
      val scored =
        for {
          start <- toks.indices
          len   <- 1 to math.min(maxSpanTokens, toks.length - start)
        } yield {
          val span = toks.slice(start, start + len).mkString(" ")
          (start, len, span, rel.score(question, span))
        }
      // repeated span text keeps its best occurrence (first by span
      // order on probability ties), then n-best by probability
      val best = scored
        .groupBy(_._3).valuesIterator
        .map(_.maxBy(s => (s._4, -s._1, -s._2)))
        .toSeq
        .sortBy { case (start, len, _, p) => (-p, start, len) }
        .take(nBest)
      val top   = best.headOption.map(_._4).getOrElse(0.0)
      val noAns = 1.0 - top
      val cands = best.zipWithIndex.map { case ((_, _, span, p), i) =>
        QaCandidate(i + 1, span, p, noAns, noAns + noAnsBoost)
      }
      (key, cands)
    }
}
