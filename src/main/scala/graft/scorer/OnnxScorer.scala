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
  *   - A QA span head integrates the same way with outputs
  *     `start_logits`/`end_logits` float32 [batch, seqLen]; n-best
  *     decoding (top start×end spans + no-answer score, FARM-style)
  *     then maps spans back through the caller's offset mapping to
  *     produce [[QaCandidate]] rows. The decode is pure Scala over
  *     the two logit arrays — no extra runtime surface — and is left
  *     to the deploying site because it is tokenizer-specific.
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

  /** One inference call: (padded ids, mask) → logits [batch][2]. */
  private[scorer] def run(
      sess: AnyRef,
      ids: Array[Array[Long]],
      mask: Array[Array[Long]]
  ): Array[Array[Float]] = {
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
      try {
        val first = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        Class.forName("ai.onnxruntime.OnnxValue").getMethod("getValue").invoke(first)
          .asInstanceOf[Array[Array[Float]]]
      } finally result.asInstanceOf[AutoCloseable].close()
    } finally {
      tIds.asInstanceOf[AutoCloseable].close()
      tMask.asInstanceOf[AutoCloseable].close()
    }
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
