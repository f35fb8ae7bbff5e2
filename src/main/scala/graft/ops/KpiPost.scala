package graft.ops

import graft.scorer.QaScorer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KPI QA stage: pluggable span extraction plus the post-processing
  * chain the reference runs per PDF
  * (src/models/text_kpi_infer.py:180-301): attach rank columns → melt
  * → split tuple column → no-answer aggregation → top-k per
  * (pdf, question) → reverse kpi_id map → column order.
  *
  * The Spark form fuses the rank-attach/melt/split dance (W4/R4/R5)
  * into one posexplode over the candidate array — same rows out, one
  * narrow pass, no wide intermediate.
  */
object KpiPost {

  private val candType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("answer", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("noAnsScore", DoubleType, nullable = false),
    StructField("noAnswerScorePlusBoost", DoubleType, nullable = false)
  )))

  /** M2: batched QA inference adding a `candidates` array column. */
  def scoreQa(
      df: DataFrame,
      scorer: QaScorer,
      keyCol: String,
      questionCol: String = "text",
      contextCol: String = "text_b",
      chunkSize: Int = 1000
  ): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("candidates", candType, nullable = true))
    val kIdx = df.schema.fieldIndex(keyCol)
    val qIdx = df.schema.fieldIndex(questionCol)
    val cIdx = df.schema.fieldIndex(contextCol)
    df.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        val preds = scorer
          .scoreBatch(chunk.iterator.map(r => (r.getLong(kIdx), r.getString(qIdx), r.getString(cIdx))))
          .toArray
        chunk.iterator.zip(preds.iterator).map { case (r, (_, cands)) =>
          Row.fromSeq(r.toSeq :+ cands.map(c =>
            Row(c.rank, c.answer, c.score, c.noAnsScore, c.noAnswerScorePlusBoost)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** W4+R4+R5: one row per (input row, rank) with the reference's
    * melted column names (`rank` = "rank_i").
    */
  def explodeRanks(scored: DataFrame): DataFrame =
    scored
      .select(col("*"), explode(col("candidates")).as("c"))
      .drop("candidates")
      .withColumn("rank", concat(lit("rank_"), col("c.rank")))
      // numeric rank kept for tie-breaks: the string form sorts
      // "rank_10" before "rank_2"
      .withColumn("rank_num", col("c.rank"))
      .withColumn("answer", col("c.answer"))
      .withColumn("score", col("c.score"))
      .withColumn("no_ans_score", col("c.noAnsScore"))
      .withColumn("no_answer_score_plus_boost", col("c.noAnswerScorePlusBoost"))
      .drop("c")

  /** A4: per (pdf_name, question-text) group where every rank_1 answer
    * is "no_answer", emit one no_answer row carrying the max rank_1
    * score (text_kpi_infer.py:17-29, 251-265).
    */
  def noAnswerRows(melted: DataFrame): DataFrame =
    melted
      .filter(col("rank") === "rank_1")
      .groupBy(col("pdf_name"), col("text"))
      .agg(
        every(col("answer") === "no_answer").as("all_no_answer"),
        max(col("score")).as("score")
      )
      .filter(col("all_no_answer"))
      .drop("all_no_answer")
      .withColumn("answer", lit("no_answer"))
      .withColumn("source", lit("Text"))

  /** A5: keep the `topK` highest-score rows per (pdf_name, text).
    * `nlargest` tie order is pandas-positional; engine semantics are a
    * total order (score desc, rank asc, key asc) so results are
    * deterministic under any partitioning.
    */
  def topKPerGroup(df: DataFrame, topK: Int, tieBreak: Seq[String]): DataFrame = {
    val order = col("score").desc +: tieBreak.map(col(_).asc)
    val w     = Window.partitionBy(col("pdf_name"), col("text")).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= topK).drop("__rn")
  }

  /** Full chain: QA scoring → melt → span/no-answer union → top-k →
    * kpi_id reverse lookup → reference column order
    * (text_kpi_infer.py:251-297). `questions` is the kpi_mapping dim
    * (question, kpi_id) — broadcast for the reverse map.
    */
  def kpiChain(
      relevant: DataFrame,
      scorer: QaScorer,
      questions: DataFrame,
      keyCol: String,
      topK: Int = 4
  ): DataFrame = {
    // materialize ONE scored stage on the group keys: the span branch
    // and the no-answer aggregation both consume `melted`, and without
    // materialization each re-runs the scorer over every partition —
    // 2× model inference, the dominant cost with a real model.
    // r19: the repartition alone never materialized (and the scorer's
    // mapPartitions closure canonicalizes per-instance, so exchange
    // reuse cannot dedup the two copies either). r20 (verdict task
    // 3): the eager localCheckpoint paid a dedicated materialization
    // job that the bench's mock scorer turned into a measured net
    // LOSS (m2 0.853 → 0.941 s) — a lazy persist gives the same
    // single-inference guarantee (both consumers resolve to ONE
    // InMemoryRelation; per-partition block locks mean one compute,
    // every other reader waits then reads the cached block —
    // spec-pinned by the counting scorer in OpsSpec) with zero extra
    // action: the scorer runs inside the first consuming job.
    // noAnswerRows' groupBy still needs no further exchange: the
    // InMemoryRelation preserves the repartition's group-key
    // partitioning. Not unpersisted here by design — the caller
    // consumes the result lazily (an unpersist in a finally would
    // empty the cache before it ever filled); the frame is
    // |relevant|·nBest rows, and session hygiene / unpersist at the
    // caller reclaims it.
    val melted =
      explodeRanks(scoreQa(relevant, scorer, keyCol))
        .repartition(col("pdf_name"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans  = melted.filter(col("answer") =!= "no_answer")
    val unioned = spans.unionByName(noAnswerRows(melted), allowMissingColumns = true)
    val top = topKPerGroup(unioned, topK, Seq("rank_num", keyCol)).drop("rank", "rank_num")
    top
      .join(broadcast(questions.select(col("question"), col("kpi_id"))),
        top("text") === col("question"), "left")
      .drop("question")
      .withColumnRenamed("text", "kpi")
      .withColumnRenamed("text_b", "paragraph")
      .select(
        Seq("pdf_name", "kpi", "kpi_id", "answer", "page").map(col) ++
          Seq(col("paragraph"), col("source"), col("score"),
            col("no_ans_score"), col("no_answer_score_plus_boost")): _*
      )
  }
}
