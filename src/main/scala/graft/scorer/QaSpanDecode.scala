package graft.scorer

/** One decoded answer span in TOKEN coordinates (inclusive ends). */
final case class SpanPred(start: Int, end: Int, score: Double)

/** Decode result for one sample: n-best spans (score-descending), the
  * raw CLS no-answer score, and the FARM `no_ans_gap` the reference's
  * consumer arithmetic inverts (text_kpi_infer.py:209-218 recovers
  * `no_answer_score = preds[0].score - no_ans_gap` when "no_answer"
  * did not rank into the n-best list).
  */
final case class QaDecoded(spans: Seq[SpanPred], clsScore: Double, noAnsGap: Double)

/** The tokenizer-side contract an ONNX QA model needs from its caller:
  * the encoded sequence plus enough geometry to map a token span back
  * to answer TEXT.
  *
  * @param ids                 unpadded `[CLS] question [SEP] context [SEP]`
  *                            token ids (the scorer pads/truncates)
  * @param contextStart        index in `ids` of the FIRST context token
  * @param contextTokenOffsets per context token, (startChar, endChar)
  *                            into the ORIGINAL context string — the
  *                            answer for token span (s, e) is
  *                            `context.substring(off(s)._1, off(e)._2)`
  */
final case class QaEncoding(
    ids: Array[Long],
    contextStart: Int,
    contextTokenOffsets: Array[(Int, Int)]
)

/** Extractive-QA n-best span decoding over `start_logits`/`end_logits`
  * — FARM semantics (the reference's QA head: deepset FARM
  * `QuestionAnsweringHead.logits_to_preds`, consumed at
  * src/models/text_kpi_infer.py:180-232):
  *
  *   - a candidate span (s, e) scores `start(s) + end(e)`, restricted
  *     to context tokens, `s ≤ e`, and `e − s + 1 ≤ maxAnswerTokens`;
  *   - "no answer" scores at the CLS position, `start(0) + end(0)`,
  *     and enters the ranked list with `no_ans_boost` added (FARM
  *     prediction_head.py L1348: the published score IS
  *     `CLS + boost`; the reference subtracts the boost back out to
  *     get the "pure" score);
  *   - `no_ans_gap = bestSpanScore − (CLS + boost)` — positive means
  *     the model prefers answering.
  *
  * Difference from FARM, documented: FARM approximates with top-k
  * starts × top-k ends; this decode enumerates ALL valid pairs
  * (O(contextLen × maxAnswerTokens) ≤ 512×30 per sample — executor-
  * side, trivially cheap next to the model forward), so its n-best is
  * the exact answer FARM's beam approximates. Ties break
  * deterministically by (start, end) ascending, the repo-wide
  * partition-layout-independence rule.
  *
  * Pure Scala over two float arrays — unit-testable with fixed logits,
  * no ONNX runtime anywhere near it.
  */
object QaSpanDecode {

  /** n-best spans for one sample.
    *
    * @param contextStart first context token index (inclusive)
    * @param contextEnd   one past the last context token (callers clamp
    *                     to what survived truncation)
    */
  def decode(
      startLogits: Array[Float],
      endLogits: Array[Float],
      contextStart: Int,
      contextEnd: Int,
      nBest: Int,
      maxAnswerTokens: Int,
      noAnsBoost: Double
  ): QaDecoded = {
    val cls = startLogits(0).toDouble + endLogits(0).toDouble
    val all = scala.collection.mutable.ArrayBuffer.empty[SpanPred]
    var s = math.max(contextStart, 0)
    val hi = math.min(contextEnd, math.min(startLogits.length, endLogits.length))
    while (s < hi) {
      var e = s
      val eMax = math.min(s + maxAnswerTokens - 1, hi - 1)
      while (e <= eMax) {
        all += SpanPred(s, e, startLogits(s).toDouble + endLogits(e).toDouble)
        e += 1
      }
      s += 1
    }
    val best = all.sortBy(p => (-p.score, p.start, p.end)).take(math.max(nBest, 0)).toSeq
    val gap  = best.headOption.map(_.score).getOrElse(cls) - (cls + noAnsBoost)
    QaDecoded(best, cls, gap)
  }

  /** Merge decoded spans with the boosted no-answer candidate into the
    * reference's ranked [[QaCandidate]] rows: repeated answer TEXT
    * keeps its best-scoring span (FARM dedups n-best by text), the
    * "no_answer" row carries `CLS + boost` as its score, and every row
    * carries (pure CLS, CLS + boost) so downstream
    * [[graft.ops.KpiPost]] aggregation runs unchanged.
    */
  def toCandidates(
      decoded: QaDecoded,
      answerOf: (Int, Int) => String,
      nBest: Int,
      noAnsBoost: Double
  ): Seq[QaCandidate] = {
    val boosted = decoded.clsScore + noAnsBoost
    // dedup by answer text, keep best occurrence (ties: earliest span)
    val spanCands = decoded.spans
      .map(p => (answerOf(p.start, p.end), p))
      .groupBy(_._1).valuesIterator
      .map(_.minBy { case (_, p) => (-p.score, p.start, p.end) })
      .toSeq
      .map { case (text, p) => (text, p.score, p.start, p.end) }
    val merged = (spanCands :+ (("no_answer", boosted, Int.MaxValue, Int.MaxValue)))
      .sortBy { case (_, score, s, e) => (-score, s, e) }
      .take(math.max(nBest, 0))
    merged.zipWithIndex.map { case ((text, score, _, _), i) =>
      QaCandidate(i + 1, text, score, decoded.clsScore, boosted)
    }
  }
}
