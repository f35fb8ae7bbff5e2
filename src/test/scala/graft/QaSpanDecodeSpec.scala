package graft

import graft.scorer.{QaSpanDecode, SpanPred}

import org.scalatest.funsuite.AnyFunSuite

/** The ONNX QA head's decode, proven against hand-computed logit
  * arrays — no runtime, no model: every rule of the FARM semantics
  * (context-only spans, max answer length, CLS no-answer + boost,
  * deterministic ties, the no_ans_gap inversion the reference's
  * consumer performs) asserted on numbers small enough to check by
  * hand.
  */
class QaSpanDecodeSpec extends AnyFunSuite {

  // seq layout: [0]=CLS, [1..2]=question, [3..7]=context
  private val startL = Array(5.0f, 0f, 0f, 1.0f, 4.0f, 0.5f, 0f, 0.2f)
  private val endL   = Array(3.0f, 0f, 0f, 0.5f, 1.0f, 6.0f, 0f, 0.1f)

  test("n-best spans are the exact top start+end pairs within the context") {
    val d = QaSpanDecode.decode(startL, endL, contextStart = 3, contextEnd = 8,
      nBest = 3, maxAnswerTokens = 2, noAnsBoost = -15.0)
    // all candidates (s,e,score): (3,3,1.5) (3,4,2) (4,4,5) (4,5,10)
    // (5,5,6.5) (5,6,0.5) (6,6,0) (6,7,0.1) (7,7,0.3)
    assert(d.spans === Seq(SpanPred(4, 5, 10.0), SpanPred(5, 5, 6.5), SpanPred(4, 4, 5.0)))
    assert(d.clsScore === 8.0) // start(0)+end(0)
  }

  test("maxAnswerTokens bounds the span length") {
    val d = QaSpanDecode.decode(startL, endL, 3, 8, nBest = 2,
      maxAnswerTokens = 1, noAnsBoost = 0.0)
    // length-1 only: best are (5,5)=6.5 then (4,4)=5
    assert(d.spans === Seq(SpanPred(5, 5, 6.5), SpanPred(4, 4, 5.0)))
  }

  test("question and special tokens never produce spans") {
    val d = QaSpanDecode.decode(startL, endL, 3, 8, nBest = 20,
      maxAnswerTokens = 8, noAnsBoost = 0.0)
    // start index 0 scores 5.0+6.0=11 — bigger than every context span —
    // but lies outside [contextStart, contextEnd)
    assert(d.spans.forall(p => p.start >= 3 && p.end < 8))
  }

  test("no_ans_gap inverts the way text_kpi_infer recovers no_answer_score") {
    val boost = -15.0
    val d = QaSpanDecode.decode(startL, endL, 3, 8, 2, 2, boost)
    // reference: no_answer_score = preds[0].score - no_ans_gap
    assert(d.spans.head.score - d.noAnsGap === d.clsScore + boost)
  }

  test("ties break deterministically by (start, end) ascending") {
    val flat = Array.fill(6)(1.0f)
    val d = QaSpanDecode.decode(flat, flat, 2, 6, nBest = 3,
      maxAnswerTokens = 2, noAnsBoost = 0.0)
    assert(d.spans === Seq(SpanPred(2, 2, 2.0), SpanPred(2, 3, 2.0), SpanPred(3, 3, 2.0)))
  }

  test("empty context yields no spans and gap falls back to the CLS score") {
    val d = QaSpanDecode.decode(startL, endL, contextStart = 5, contextEnd = 5,
      nBest = 2, maxAnswerTokens = 2, noAnsBoost = -1.0)
    assert(d.spans.isEmpty)
    assert(d.noAnsGap === (d.clsScore - (d.clsScore - 1.0)))
  }

  // ---- toCandidates: the merge into the reference's ranked rows

  private def answerOf(s: Int, e: Int): String = s"tok$s-$e"

  test("no_answer competes with its boosted score and wins under a mild boost") {
    val d = QaSpanDecode.decode(startL, endL, 3, 8, 2, 2, noAnsBoost = -1.0)
    val cands = QaSpanDecode.toCandidates(d, answerOf, nBest = 2, noAnsBoost = -1.0)
    // spans 10.0 and 6.5 vs no_answer at 8-1=7 → ranks: span, no_answer
    assert(cands.map(c => (c.rank, c.answer, c.score)) ===
      Seq((1, "tok4-5", 10.0), (2, "no_answer", 7.0)))
    assert(cands.forall(c => c.noAnsScore === 8.0 && c.noAnswerScorePlusBoost === 7.0))
  }

  test("the reference's -15 boost pushes no_answer out of the n-best") {
    val d = QaSpanDecode.decode(startL, endL, 3, 8, 2, 2, noAnsBoost = -15.0)
    val cands = QaSpanDecode.toCandidates(d, answerOf, nBest = 2, noAnsBoost = -15.0)
    assert(cands.map(_.answer) === Seq("tok4-5", "tok5-5"))
    assert(cands.head.noAnswerScorePlusBoost === -7.0)
  }

  test("repeated answer TEXT keeps only its best-scoring span") {
    val d = QaSpanDecode.decode(startL, endL, 3, 8, 3, 2, noAnsBoost = -15.0)
    // map the top two spans to the SAME text
    val collide = (s: Int, e: Int) => if (e <= 5) "same" else s"tok$s-$e"
    val cands = QaSpanDecode.toCandidates(d, collide, nBest = 3, noAnsBoost = -15.0)
    assert(cands.count(_.answer == "same") === 1)
    assert(cands.head.score === 10.0) // the best "same" occurrence survived
  }

  test("empty context decodes to a lone no_answer candidate") {
    val d = QaSpanDecode.decode(startL, endL, 5, 5, 2, 2, noAnsBoost = -1.0)
    val cands = QaSpanDecode.toCandidates(d, answerOf, nBest = 2, noAnsBoost = -1.0)
    assert(cands.map(_.answer) === Seq("no_answer"))
  }
}
