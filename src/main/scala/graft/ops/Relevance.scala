package graft.ops

import graft.scorer.RelevanceScorer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Relevance stage: question × paragraph pairing plus pluggable
  * classifier inference (SURVEY §2.3 J3, §2.8 M1).
  */
object Relevance {

  /** J3: every KPI question paired with every extracted paragraph,
    * keyed by pdf/page. The reference loops per PDF
    * (src/models/relevance_infer.py:196-231); distributed form is a
    * broadcast cross join — the question side is tiny (~20 rows), so
    * the pair space streams out of the paragraph scan without any
    * shuffle, pre-partitioned by pdf for the scorer stage.
    */
  def questionParagraphPairs(paragraphs: DataFrame, questions: DataFrame): DataFrame =
    paragraphs
      .select(
        col("page"),
        col("pdf_name"),
        col("paragraph").as("text_b")
      )
      .crossJoin(broadcast(questions.select(col("question").as("text"))))
      .withColumn("source", lit("Text"))
      .select("page", "pdf_name", "text", "text_b", "source")

  /** M1: partition-batched model inference adding a `prob` column.
    * Batches of `chunkSize` mirror the reference's
    * `inference_from_dicts` slices of 1000
    * (relevance_infer.py:99-109); the scorer sees an iterator per
    * batch so an ONNX session can amortize across rows. Rows with
    * prob >= threshold are the "label == 1" set the reference keeps
    * (relevance_infer.py:113-117).
    */
  def scoreRelevance(
      pairs: DataFrame,
      scorer: RelevanceScorer,
      keyCol: String,
      textCol: String = "text",
      textBCol: String = "text_b",
      chunkSize: Int = 1000
  ): DataFrame = {
    val outSchema = StructType(pairs.schema.fields :+
      org.apache.spark.sql.types.StructField("prob", DoubleType, nullable = false))
    val kIdx  = pairs.schema.fieldIndex(keyCol)
    val tIdx  = pairs.schema.fieldIndex(textCol)
    val tbIdx = pairs.schema.fieldIndex(textBCol)
    pairs.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        val scores = scorer
          .scoreBatch(chunk.iterator.map(r => (r.getLong(kIdx), r.getString(tIdx), r.getString(tbIdx))))
          .toArray
        chunk.iterator.zip(scores.iterator).map { case (r, (_, p)) =>
          Row.fromSeq(r.toSeq :+ p)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Full relevance filter: score then keep predicted-relevant rows. */
  def relevantPairs(pairs: DataFrame, scorer: RelevanceScorer, keyCol: String, threshold: Double): DataFrame =
    scoreRelevance(pairs, scorer, keyCol).filter(col("prob") >= threshold)
}
