package graft.scorer

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}

/** [[RelevanceScorer]] backed by a *trained* MLlib pipeline
  * (RegexTokenizer → HashingTF → LogisticRegression) — the non-mock
  * proof of the Scorer seam. The reference runs its relevance head as
  * batch inference over question/paragraph dicts
  * (src/models/relevance_infer.py:96-125); here the trained model's
  * featurization + linear head are re-expressed as pure row math so
  * scoring runs inside [[graft.ops.Relevance.scoreRelevance]]'s
  * partition batches: no nested session, no per-batch `transform()`,
  * just the same iterator contract every scorer implementation gets.
  *
  * Parity with `model.transform` is spec-asserted (ScorerPipelineSpec):
  * tokenization replays RegexTokenizer's lowercase/gaps/minTokenLength
  * semantics, bucketing delegates to the fitted stage's own
  * `HashingTF.indexOf`, and the probability is the sigmoid of the
  * linear margin — bit-for-bit the binary LogisticRegressionModel path.
  *
  * Scale note: the closure carries the dense coefficient array
  * (numFeatures doubles, 128 KiB at the default 2^14) — small enough
  * to ship per task; wrap the scorer construction in
  * `spark.sparkContext.broadcast` if numFeatures grows to 2^20+.
  */
final class LogisticRelevanceScorer private (
    hashingTF: HashingTF,
    coefficients: Array[Double],
    intercept: Double,
    lowercase: Boolean,
    pattern: String,
    gaps: Boolean,
    minTokenLength: Int,
    binary: Boolean,
    combineSep: String
) extends RelevanceScorer {

  @transient private lazy val regex = new scala.util.matching.Regex(pattern)

  private def tokensOf(raw: String): Array[String] = {
    val str = if (lowercase) raw.toLowerCase else raw
    val toks =
      if (gaps) regex.split(str)
      else regex.findAllIn(str).toArray
    toks.filter(_.length >= minTokenLength)
  }

  /** P(positive) for one (question, text) pair — the single scoring
    * path shared by the batch iterator and [[LogisticQaScorer]]'s
    * span ranking.
    */
  def score(question: String, text: String): Double = {
    val toks = tokensOf(question + combineSep + text)
    val buckets =
      if (binary) toks.map(hashingTF.indexOf(_: Any)).distinct
      else toks.map(hashingTF.indexOf(_: Any))
    var margin = intercept
    var i      = 0
    while (i < buckets.length) { margin += coefficients(buckets(i)); i += 1 }
    1.0 / (1.0 + math.exp(-margin))
  }

  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Double)] =
    batch.map { case (key, question, paragraph) => (key, score(question, paragraph)) }
}

object LogisticRelevanceScorer {

  /** Extract the trained stages of a
    * [[graft.ops.MlPipelines.trainRelevanceClassifier]] pipeline.
    * `combineSep` must match how the training `text` column was built
    * from (question, paragraph) — default single space.
    */
  def fromModel(model: PipelineModel, combineSep: String = " "): LogisticRelevanceScorer = {
    def stage[T](pf: PartialFunction[Any, T], what: String): T =
      model.stages.collectFirst(pf).getOrElse(
        throw new IllegalArgumentException(s"pipeline has no $what stage"))
    val tok = stage({ case t: RegexTokenizer => t }, "RegexTokenizer")
    val tf  = stage({ case t: HashingTF => t }, "HashingTF")
    val lr  = stage({ case m: LogisticRegressionModel => m }, "LogisticRegressionModel")
    new LogisticRelevanceScorer(
      tf,
      lr.coefficients.toArray,
      lr.intercept,
      tok.getToLowercase,
      tok.getPattern,
      tok.getGaps,
      tok.getMinTokenLength,
      tf.getBinary,
      combineSep)
  }
}
