package graft.scorer

/** ONNX Runtime integration seam for the [[RelevanceScorer]] /
  * [[QaScorer]] traits — the production implementation of the seam the
  * logistic heads prove end to end (reference workload:
  * src/models/relevance_infer.py:96-125 runs a BERT cross-encoder over
  * (question, paragraph) pairs in chunked batches; this class is that
  * loop with Spark supplying the partition batches).
  *
  * The onnxruntime jar is NOT a dependency of this library (the build
  * is offline and the engine must not drag a 100 MB native runtime
  * into every deployment). All calls go through reflection, so this
  * file compiles and ships inert; at a site that adds
  * `com.microsoft.onnxruntime:onnxruntime` (any 1.x) to the Spark
  * classpath (`--jars` / cluster default), [[OnnxScorer.available]]
  * flips true and the scorer runs. Nothing else changes — queries
  * construct a scorer and pass it exactly like the mock/logistic ones.
  *
  * ==Model contract (relevance)==
  *
  * The exported graph must accept
  *   - `input_ids`      int64 [batch, seqLen]
  *   - `attention_mask` int64 [batch, seqLen]
  * and produce as its FIRST output
  *   - logits float32 [batch, 2] — index 1 = "relevant"
  * which is the standard HuggingFace
  * `AutoModelForSequenceClassification` ONNX export
  * (`optimum-cli export onnx --task text-classification`).
  * P(relevant) = softmax(logits)(1).
  *
  * Tokenization is supplied by the caller as a plain
  * `(question, paragraph) => Array[Long]` function (e.g. a WordPiece
  * vocab loaded with the BPE machinery in [[graft.ops.TextAnalysis]],
  * or a JNI tokenizer) — the scorer pads/truncates to `maxLen` and
  * builds the mask. Keeping tokenization OUT of this class keeps the
  * seam model-family-agnostic.
  *
  * ==Execution shape (the part that matters at scale)==
  *
  *   - ONE `OrtSession` per executor JVM, created lazily on first
  *     batch and cached in a JVM-global map keyed by model path
  *     (`OrtSession` is thread-safe; per-partition sessions would
  *     re-load the model per task). The model file must be local to
  *     the executor (ship via `SparkFiles`/`--files`).
  *   - Batches of `batchSize` rows per `run` call — the partition
  *     iterator maps lazily, so memory is one batch of tensors, not a
  *     partition.
  *   - The QA span head ([[OnnxQaScorer]]) integrates the same way
  *     with outputs `start_logits`/`end_logits` float32
  *     [batch, seqLen] (the standard
  *     `AutoModelForQuestionAnswering` ONNX export; outputs located
  *     by name with a positional 0/1 fallback). N-best decoding —
  *     top start×end spans + CLS no-answer score + `no_ans_boost`,
  *     FARM semantics — is pure Scala in [[QaSpanDecode]], unit-
  *     tested against fixed logit arrays with no runtime present;
  *     the caller's [[QaEncoding]] offsets map token spans back to
  *     answer text.
  */
object OnnxScorer {

  /** True iff ai.onnxruntime is on the classpath. */
  lazy val available: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: Throwable => false }

  // One session per (executor JVM, model path): OrtSession is
  // thread-safe and model load is the expensive step.
  @transient private lazy val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private[scorer] def session(modelPath: String): AnyRef = {
    if (!available)
      throw new IllegalStateException(
        "onnxruntime is not on the classpath — add com.microsoft.onnxruntime:onnxruntime " +
          "to the Spark classpath (--jars) to use OnnxRelevanceScorer; see OnnxScorer scaladoc")
    sessions.computeIfAbsent(modelPath, p => {
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
      val env    = envCls.getMethod("getEnvironment").invoke(null)
      envCls.getMethod("createSession", classOf[String]).invoke(env, p)
    })
  }

  /** Run one batch and hand the open Result to `read` before closing
    * tensors and result (reflection-side resource bracket shared by
    * the classification and QA heads).
    */
  private def withResult[A](
      sess: AnyRef,
      ids: Array[Array[Long]],
      mask: Array[Array[Long]]
  )(read: AnyRef => A): A = {
    val envCls    = Class.forName("ai.onnxruntime.OrtEnvironment")
    val env       = envCls.getMethod("getEnvironment").invoke(null)
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val create    = tensorCls.getMethod("createTensor", envCls, classOf[Object])
    val tIds      = create.invoke(null, env, ids)
    val tMask     = create.invoke(null, env, mask)
    try {
      val inputs = new java.util.HashMap[String, AnyRef]()
      inputs.put("input_ids", tIds)
      inputs.put("attention_mask", tMask)
      val result = sess.getClass.getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(sess, inputs)
      try read(result)
      finally result.asInstanceOf[AutoCloseable].close()
    } finally {
      tIds.asInstanceOf[AutoCloseable].close()
      tMask.asInstanceOf[AutoCloseable].close()
    }
  }

  private def outputAt(result: AnyRef, idx: Int): Array[Array[Float]] = {
    val v = result.getClass.getMethod("get", classOf[Int])
      .invoke(result, Integer.valueOf(idx))
    Class.forName("ai.onnxruntime.OnnxValue").getMethod("getValue").invoke(v)
      .asInstanceOf[Array[Array[Float]]]
  }

  private def outputNamed(result: AnyRef, name: String, fallbackIdx: Int): Array[Array[Float]] = {
    val opt = result.getClass.getMethod("get", classOf[String])
      .invoke(result, name).asInstanceOf[java.util.Optional[AnyRef]]
    if (opt.isPresent)
      Class.forName("ai.onnxruntime.OnnxValue").getMethod("getValue").invoke(opt.get)
        .asInstanceOf[Array[Array[Float]]]
    else outputAt(result, fallbackIdx)
  }

  /** One inference call: (padded ids, mask) → logits [batch][2]. */
  private[scorer] def run(
      sess: AnyRef,
      ids: Array[Array[Long]],
      mask: Array[Array[Long]]
  ): Array[Array[Float]] =
    withResult(sess, ids, mask)(outputAt(_, 0))

  /** One QA inference call: (padded ids, mask) →
    * (start_logits, end_logits), each [batch][seqLen]. Outputs are
    * looked up by the standard export names, positions 0/1 as the
    * fallback for graphs exported without names.
    */
  private[scorer] def runQa(
      sess: AnyRef,
      ids: Array[Array[Long]],
      mask: Array[Array[Long]]
  ): (Array[Array[Float]], Array[Array[Float]]) =
    withResult(sess, ids, mask) { r =>
      (outputNamed(r, "start_logits", 0), outputNamed(r, "end_logits", 1))
    }
}

/** [[RelevanceScorer]] backed by an ONNX sequence-classification
  * model — see [[OnnxScorer]] for the model contract and runtime
  * requirements. Construction is cheap and serializable (the session
  * opens lazily executor-side on the first batch).
  *
  * @param modelPath executor-local path to the .onnx file
  * @param encode    tokenizer: (question, paragraph) → token ids
  * @param maxLen    pad/truncate length (model's export seq length)
  * @param batchSize rows per inference call
  */
final class OnnxRelevanceScorer(
    modelPath: String,
    encode: (String, String) => Array[Long],
    maxLen: Int = 512,
    batchSize: Int = 32
) extends RelevanceScorer {

  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Double)] = {
    val sess = OnnxScorer.session(modelPath)
    batch.grouped(batchSize).flatMap { chunk =>
      val enc  = chunk.map { case (_, q, p) => encode(q, p).take(maxLen) }
      val ids  = enc.map(a => java.util.Arrays.copyOf(a, maxLen)).toArray
      val mask = enc.map(a => Array.tabulate(maxLen)(i => if (i < a.length) 1L else 0L)).toArray
      val logits = OnnxScorer.run(sess, ids, mask)
      chunk.zip(logits).map { case ((key, _, _), l) =>
        // softmax over 2 classes, index 1 = relevant
        val m = math.max(l(0), l(1))
        val (e0, e1) = (math.exp(l(0) - m), math.exp(l(1) - m))
        (key, e1 / (e0 + e1))
      }
    }
  }
}

/** [[QaScorer]] backed by an ONNX extractive-QA span head — the
  * production implementation of the seam [[graft.scorer.MockQaScorer]]
  * / [[LogisticQaScorer]] prove end to end (reference workload:
  * src/models/text_kpi_infer.py:180-232 — FARM n-best span dicts with
  * `no_ans_boost`, consumed unchanged by [[graft.ops.KpiPost]]).
  *
  * Model contract: `input_ids`/`attention_mask` int64 [batch, seqLen]
  * in, `start_logits`/`end_logits` float32 [batch, seqLen] out — the
  * standard `AutoModelForQuestionAnswering` ONNX export. Decoding is
  * [[QaSpanDecode]] (exact n-best over valid start×end pairs + CLS
  * no-answer + boost); the caller's [[QaEncoding]] maps winning token
  * spans back to answer text. Same executor-side shape as the
  * relevance scorer: one session per JVM, lazy partition batches.
  *
  * @param modelPath       executor-local path to the .onnx file
  * @param encode          tokenizer: (question, context) → ids +
  *                        context-token char offsets
  * @param nBest           ranked candidates per row (no_answer
  *                        competes for a slot, FARM-style)
  * @param maxAnswerTokens longest decodable answer span
  * @param noAnsBoost      added to the CLS no-answer score before
  *                        ranking (reference default −15,
  *                        notebooks/demo2/settings.yaml infer_kpi)
  */
final class OnnxQaScorer(
    modelPath: String,
    encode: (String, String) => QaEncoding,
    nBest: Int = 2,
    maxAnswerTokens: Int = 30,
    noAnsBoost: Double = -15.0,
    maxLen: Int = 512,
    batchSize: Int = 32
) extends QaScorer {

  def scoreBatch(batch: Iterator[(Long, String, String)]): Iterator[(Long, Seq[QaCandidate])] = {
    val sess = OnnxScorer.session(modelPath)
    batch.grouped(batchSize).flatMap { chunk =>
      val encs = chunk.map { case (_, q, c) => encode(q, c) }
      val lens = encs.map(e => math.min(e.ids.length, maxLen))
      val ids  = encs.map(e => java.util.Arrays.copyOf(e.ids, maxLen)).toArray
      val mask = lens.map(n => Array.tabulate(maxLen)(i => if (i < n) 1L else 0L)).toArray
      val (startL, endL) = OnnxScorer.runQa(sess, ids, mask)
      chunk.lazyZip(encs).lazyZip(lens).lazyZip(startL.zip(endL)).map {
        case ((key, _, context), enc, realLen, (sl, el)) =>
          // context tokens surviving truncation (the trailing [SEP]
          // never carries answer text, hence the offsets bound)
          val ctxEnd = math.min(enc.contextStart + enc.contextTokenOffsets.length, realLen)
          val decoded = QaSpanDecode.decode(
            sl, el, enc.contextStart, ctxEnd, nBest, maxAnswerTokens, noAnsBoost)
          def answerOf(s: Int, e: Int): String = {
            val from = enc.contextTokenOffsets(s - enc.contextStart)._1
            val to   = enc.contextTokenOffsets(e - enc.contextStart)._2
            context.substring(from, to)
          }
          (key, QaSpanDecode.toCandidates(decoded, answerOf, nBest, noAnsBoost))
      }
    }
  }
}
