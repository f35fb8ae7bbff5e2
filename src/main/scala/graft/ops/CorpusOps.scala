package graft.ops

import graft.functions.DetHash

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond dedup/similarity: rule-based quality filtering with
  * drop accounting, deterministic stratified sampling for mixture
  * control, and gap sessionization over event streams.
  *
  * All three are pure column algebra (codegen'd, no UDFs) and
  * deterministic under repartitioning, so each is oracle-checkable in
  * ANSI SQL — the same guarantee every other graft operator carries.
  */
object CorpusOps {

  /** Gopher-style rule filter (Rae et al. 2021, §A1.1: word-count
    * bounds, mean-word-length band, symbol ratio, stopword floor) with
    * first-failing-rule accounting. Emits every row with `keep` and
    * `drop_reason` ('' when kept) so the pipeline can audit drop
    * distribution by reason — at 100 TB the audit aggregate is how you
    * notice a rule eating a language or a domain.
    */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minStopwordHits: Int = 2
  ): DataFrame = {
    val t     = col(textCol)
    val ts    = filter(split(lower(t), " "), x => x =!= "")
    val withT = df.withColumn("__toks", ts)
    val nToks  = size(col("__toks")).cast("double")
    val nChars = length(t).cast("double")
    val mwl    = when(nToks > 0, (nChars - (nToks - 1)) / nToks).otherwise(lit(0.0))
    val symbol = length(regexp_replace(t, "[A-Za-z0-9 ]", "")).cast("double")
    val symbolRatio = when(nChars > 0, symbol / nChars).otherwise(lit(0.0))
    val stopHits = TextAnalysis.stopwordHitsOf(col("__toks"), TextAnalysis.LangStopwords.head._2)
    val reason = when(nToks < minTokens, "too_few_tokens")
      .when(nToks > maxTokens, "too_many_tokens")
      .when(mwl < minMeanWordLen, "mean_word_len_low")
      .when(mwl > maxMeanWordLen, "mean_word_len_high")
      .when(symbolRatio > maxSymbolRatio, "symbol_ratio")
      .when(stopHits < minStopwordHits, "no_stopwords")
      .otherwise("")
    withT
      .withColumn("drop_reason", reason)
      .withColumn("keep", col("drop_reason") === "")
      .drop("__toks")
  }

  /** Repetition signals (the other half of the Gopher quality rules:
    * duplicate-content fractions). `dup_token_ratio` = 1 − distinct/
    * total tokens; `top_bigram_frac` = share of the most frequent
    * bigram. The bigram mode is computed by explode + count + max —
    * a map-side-combinable aggregation shuffling one row per distinct
    * (doc, bigram) — NOT the per-row array-mode formulation, whose
    * size(filter(...))-per-element inner loop is O(tokens²) per row
    * and dies on long documents.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts    = filter(split(lower(col(textCol)), " "), x => x =!= "")
    val withT = df.select(col(idCol), ts.as("__toks"))
    val nTok  = size(col("__toks"))
    val base = withT.select(
      col(idCol),
      col("__toks"),
      when(nTok > 0,
        round(lit(1.0) - size(array_distinct(col("__toks"))).cast("double") / nTok, 4))
        .otherwise(lit(0.0)).as("dup_token_ratio"),
      (nTok - 1).as("n_bigrams"))
    val bigrams = base
      .filter(col("n_bigrams") > 0)
      .select(col(idCol), col("n_bigrams"),
        explode(transform(sequence(lit(1), col("n_bigrams")),
          i => concat_ws(" ", element_at(col("__toks"), i), element_at(col("__toks"), i + 1))))
          .as("bigram"))
    val top = bigrams
      .groupBy(col(idCol), col("n_bigrams"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n_bigrams")).agg(max(col("c")).as("top_c"))
      .select(col(idCol).as("__id"),
        round(col("top_c").cast("double") / col("n_bigrams"), 4).as("top_bigram_frac"))
    base
      .join(top, base(idCol) === col("__id"), "left")
      .select(col(idCol), col("dup_token_ratio"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Deterministic stratified sampling: keep a row iff the key's unit
    * hash falls under its stratum's rate — the mixture-control step of
    * a training-data pipeline (e.g. downsample a dominant source).
    * Pure per-row math: no shuffle, no sampling state, stable under
    * repartitioning and re-runs, and the rate map broadcasts as a
    * literal CASE.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(DetHash.detUnit(col(keyCol)) < rate)
  }

  /** Gap sessionization: events more than `gap` apart (same user)
    * start a new session. Classic cumulative-sum-over-new-session-flag
    * window; the only shuffle is the hash partition by user the window
    * requires, and timestamps stay in their integer domain (`gap` in
    * the same unit as `tsCol` — epoch micros in the oracle query,
    * since DuckDB truncates TIMESTAMP(NANOS) to micros) so the
    * comparison is exact. Tie-robust: equal timestamps yield a zero
    * gap flag in any order, so session ids are layout-independent.
    * Returns one row per session: (user, session_id, n_events, start,
    * end).
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gap: Long
  ): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
    val newSession = when(
      col(tsCol) - lag(col(tsCol), 1).over(byUser) > gap, 1L
    ).otherwise(lit(0L))
    events
      .withColumn("__new", newSession)
      .withColumn("session_id", sum(col("__new")).over(
        Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }
}
