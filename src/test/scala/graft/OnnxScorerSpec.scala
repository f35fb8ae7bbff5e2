package graft

import graft.scorer.{OnnxQaScorer, OnnxRelevanceScorer, OnnxScorer, WordPieceVocab}

import org.scalatest.funsuite.AnyFunSuite

/** The ONNX seam's offline contract: the class compiles and constructs
  * WITHOUT the runtime, reports unavailability truthfully, and fails
  * with the documented actionable error — never a ClassNotFound
  * surprise mid-job. The live-inference test auto-skips unless
  * onnxruntime is on the classpath (it is not in this offline build;
  * at a site that adds the jar, it exercises a real session open).
  */
class OnnxScorerSpec extends AnyFunSuite {

  private val toyEncode: (String, String) => Array[Long] =
    (q, p) => (q + " " + p).split(" ").filter(_.nonEmpty).map(_.length.toLong)

  test("seam compiles and constructs without the onnxruntime dependency") {
    val scorer = new OnnxRelevanceScorer("/nonexistent/model.onnx", toyEncode)
    assert(scorer.isInstanceOf[graft.scorer.RelevanceScorer])
  }

  test("unavailable runtime fails fast with the documented, actionable error") {
    assume(!OnnxScorer.available, "runtime present — covered by the live test instead")
    val scorer = new OnnxRelevanceScorer("/nonexistent/model.onnx", toyEncode)
    val e = intercept[IllegalStateException] {
      scorer.scoreBatch(Iterator((1L, "q", "p"))).toList
    }
    assert(e.getMessage.contains("onnxruntime"))
    assert(e.getMessage.contains("--jars"))
  }

  test("live inference when the runtime is present (auto-skips offline)") {
    assume(OnnxScorer.available, "onnxruntime not on the classpath")
    // With the runtime present, a session open against a missing file
    // must throw the runtime's own error (path is exercised for real);
    // sites with a model wire modelPath to a --files-shipped .onnx.
    val scorer = new OnnxRelevanceScorer("/nonexistent/model.onnx", toyEncode)
    intercept[Exception] { scorer.scoreBatch(Iterator((1L, "q", "p"))).toList }
  }

  // ---- QA span head seam (decode itself is proven in QaSpanDecodeSpec
  // with fixed logits; these pin the runtime-boundary contract)

  private lazy val wp = WordPieceVocab.load(
    getClass.getResource("/wordpiece/vocab.txt").getPath)

  test("QA seam compiles and constructs with the WordPiece encoder, no runtime") {
    val scorer = new OnnxQaScorer("/nonexistent/model.onnx", wp.encodeQa)
    assert(scorer.isInstanceOf[graft.scorer.QaScorer])
  }

  test("QA seam fails fast offline with the documented, actionable error") {
    assume(!OnnxScorer.available, "runtime present — covered by the live test instead")
    val scorer = new OnnxQaScorer("/nonexistent/model.onnx", wp.encodeQa)
    val e = intercept[IllegalStateException] {
      scorer.scoreBatch(Iterator((1L, "the target", "net zero target"))).toList
    }
    assert(e.getMessage.contains("onnxruntime"))
    assert(e.getMessage.contains("--jars"))
  }

  test("QA live path when the runtime is present (auto-skips offline)") {
    assume(OnnxScorer.available, "onnxruntime not on the classpath")
    val scorer = new OnnxQaScorer("/nonexistent/model.onnx", wp.encodeQa)
    intercept[Exception] {
      scorer.scoreBatch(Iterator((1L, "the target", "net zero target"))).toList
    }
  }
}
