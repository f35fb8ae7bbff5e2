package graft.scorer

import graft.functions.DetHash

/** Pluggable batch inference — the reference's expensive "table
  * functions" (M1 relevance classifier, M2 QA span extractor;
  * reference: src/models/relevance_infer.py:96-125,
  * src/models/text_kpi_infer.py:180-232). The engine treats a model as
  * an opaque per-partition batch function: Spark supplies partition
  * iterators (the analog of the reference's chunk_size=1000 slices),
  * the scorer maps them, and everything downstream is ordinary
  * relational processing. Swap `Mock*` for an ONNX/JNI-backed
  * implementation without touching any query.
  *
  * The mock scorers are pure functions of a 64-bit row key (Knuth
  * multiplicative hash → [0,1)), so their output is deterministic,
  * partition-layout-independent, and exactly reproducible in ANSI SQL —
  * which is what lets the driver's DuckDB oracle hash-match the whole
  * inference pipeline end to end.
  */
final case class QaCandidate(
    rank: Int,
    answer: String,
    score: Double,
    noAnsScore: Double,
    noAnswerScorePlusBoost: Double
)

trait RelevanceScorer extends Serializable {
  /** (key, question, paragraph) → P(relevant). */
  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Double)]
}

trait QaScorer extends Serializable {
  /** (key, question, context) → n-best candidates (rank 1..n). */
  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Seq[QaCandidate])]
}

object MockScores {
  def unit(key: Long): Double =
    ((((key % DetHash.KeyMod) * DetHash.Mult) % DetHash.Mod + DetHash.Mod) % DetHash.Mod).toDouble /
      DetHash.Mod.toDouble

  /** 3-token slice of `context` at a key-derived offset (1-based token
    * index), mirroring TextFns.tokenSlice / SQL list_slice semantics.
    */
  def spanAnswer(key: Long, context: String): String = {
    val toks  = context.split(" ").filter(_.nonEmpty) // empties dropped: SQL list_filter parity
    val ntok  = toks.length
    val start = (unit(key) * math.max(ntok - 2, 1)).toInt // 0-based floor
    toks.slice(start, start + 3).mkString(" ")
  }
}

/** Deterministic mock relevance model: P(relevant) = hash(key). */
final class MockRelevanceScorer extends RelevanceScorer {
  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Double)] =
    batch.map { case (key, _, _) => (key, MockScores.unit(key)) }
}

/** Deterministic mock QA model emitting `nBest` span candidates plus
  * FARM-style no-answer scores (no_ans_boost default −15 per
  * notebooks/demo2/settings.yaml infer_kpi).
  */
final class MockQaScorer(nBest: Int = 2, noAnsBoost: Double = -15.0, pNoAnswer: Double = 0.25)
    extends QaScorer {
  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Seq[QaCandidate])] =
    batch.map { case (key, _, context) =>
      val noAns     = -1.0 + 2.0 * MockScores.unit(key * 19)
      val noAnsPlus = noAns + noAnsBoost
      val cands = (1 to nBest).map { i =>
        val isNoAns = MockScores.unit(key * 31 + i) < pNoAnswer
        val answer  = if (isNoAns) "no_answer" else MockScores.spanAnswer(key * 17 + i, context)
        val score   = (nBest - i + 1).toDouble + MockScores.unit(key * 13 + i)
        QaCandidate(i, answer, score, noAns, noAnsPlus)
      }
      (key, cands)
    }
}
