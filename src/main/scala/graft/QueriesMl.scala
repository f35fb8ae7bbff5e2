package graft

import graft.GraftSession.table
import graft.ops.{Dedup, MlPipelines, Relevance}
import graft.scorer.LogisticRelevanceScorer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1 with a *trained* (non-mock) model through the Scorer seam:
  * train the MLlib relevance head
  * ([[graft.ops.MlPipelines.trainRelevanceClassifier]]) on a
  * deterministically-labeled question/paragraph set, extract it into a
  * [[graft.scorer.LogisticRelevanceScorer]], and run the SAME
  * partition-batched inference operator the mock pipeline uses
  * (reference: src/models/relevance_infer.py:96-125 — the trained FARM
  * head scoring question×paragraph pairs in chunks).
  *
  * No DuckDB oracle: the learned coefficients are not expressible as a
  * static SQL string, so the driver records a rows-only check (row
  * count is layout-independent: 2 gold groups). Numeric parity of the
  * scorer vs `model.transform` is spec-asserted in ScorerPipelineSpec.
  */
object QueriesMl {

  private val Question = "does the document mention the vector primitive"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_relevance_trained" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      // perfectly-learnable relevance signal: the paragraph contains
      // the token the question asks about
      val gold = when(array_contains(Dedup.tokens(col("text")), "vector"), 1.0).otherwise(0.0)
      val labeled = d.select(
        concat(lit(Question), lit(" "), col("text")).as("text"),
        gold.as("label"))
      val model  = MlPipelines.trainRelevanceClassifier(labeled)
      val scorer = LogisticRelevanceScorer.fromModel(model)
      val pairs = d.select(
        col("doc_id"),
        lit(Question).as("text"),
        col("text").as("text_b"),
        gold.cast("long").as("gold"))
        .withColumn("key", col("doc_id"))
      Relevance.scoreRelevance(pairs, scorer, "key")
        .withColumn("pred", when(col("prob") >= 0.5, 1L).otherwise(0L))
        .groupBy("gold")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("pred") === col("gold"), 1L).otherwise(0L)).as("n_correct"))
        .orderBy("gold")
    })
  )

  /** Not SQL-expressible (trained coefficients) → rows-only check. */
  val oracleSql: Map[String, String] = Map.empty
}
