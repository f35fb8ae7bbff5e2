package graft.ops

import graft.functions.{DetHash, TextFns}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The NQ (Natural Questions) curation pipeline: long-answer-candidate
  * extraction → relevance-dataset split (text vs table) → balanced
  * positive/negative dataset.
  *
  * Reference: src/components/preprocessing/nq_extractor.py:84-140
  * (candidate extraction, no-long-answer drop, top-level filter),
  * src/components/preprocessing/nq_curator.py:100-162
  * (`create_relevance_dataset`: with_table split, HTML strip,
  * shortness filter, keep-questions-with-both-labels) and
  * nq_curator.py:164-196 (`_build_balanced_dataset`: shuffled
  * first-negative-per-question, optional question shuffle for
  * cross-document negatives, balanced concat).
  *
  * Scale design: the extractor's per-candidate Python loop becomes a
  * single `posexplode` over the candidate spans — the document text is
  * carried once per row into the explode and sliced per candidate, so
  * there is no lambda-capture re-evaluation (the token array is a
  * plain attribute of the exploded child, computed once per candidate
  * row, not once per array element; see the Dedup scaladoc for the
  * HOF-capture trap this avoids). Every downstream step — the
  * both-labels filter, the first-negative pick — is a window over
  * `question`, so the whole chain after the explode rides ONE exchange
  * on `question`. The reference's three `sample(frac=1,
  * random_state=42)` shuffles are re-expressed as key-hash orderings
  * ([[graft.functions.DetHash]] / md5), deterministic under any
  * partitioning. The question-shuffle pairing is a rank join over the
  * one-negative-per-question frame (|questions| rows, i.e. the small
  * output side, not the candidate corpus), replicating pandas'
  * positional assignment of a shuffled question column.
  */
object NqCuration {

  /** `get_text_section`: whitespace tokens [start, end) of the
    * document, rejoined (nq_utils.py:6-8). Python slice semantics:
    * out-of-range clamps, empty slice → "".
    */
  def textSection(toks: Column, start: Column, end: Column): Column =
    array_join(
      slice(toks, start.cast("int") + lit(1), greatest(end - start, lit(0)).cast("int")),
      " ")

  /** The real NQ JSONL shape (simplified-NQ lines:
    * nq_extractor.py:84-115) read with an explicit schema and
    * flattened to the frame [[relevanceRows]] consumes: first
    * annotation unnested (long-answer span + candidate_index, first
    * short answer or -1, yes/no answer), candidate list carried as-is.
    * The explicit schema means Spark never samples the (huge) files to
    * infer types, and column pruning drops `document_text` at the scan
    * whenever a downstream query doesn't slice it.
    */
  def readNqJsonl(spark: SparkSession, path: String): DataFrame = {
    val candType = StructType(Seq(
      StructField("start_token", LongType),
      StructField("end_token", LongType),
      StructField("top_level", BooleanType)))
    val schema = StructType(Seq(
      StructField("example_id", LongType),
      StructField("document_text", StringType),
      StructField("question_text", StringType),
      StructField("annotations", ArrayType(StructType(Seq(
        StructField("yes_no_answer", StringType),
        StructField("long_answer", StructType(Seq(
          StructField("start_token", LongType),
          StructField("end_token", LongType),
          StructField("candidate_index", LongType)))),
        StructField("short_answers", ArrayType(StructType(Seq(
          StructField("start_token", LongType),
          StructField("end_token", LongType))))))))),
      StructField("long_answer_candidates", ArrayType(candType))))
    val shortAns = try_element_at(col("ann.short_answers"), lit(1))
    spark.read.schema(schema).json(path)
      .select(
        col("example_id"), col("document_text"), col("question_text"),
        try_element_at(col("annotations"), lit(1)).as("ann"),
        col("long_answer_candidates").as("candidates"))
      .select(
        col("example_id"), col("document_text"), col("question_text"),
        col("ann.yes_no_answer").as("yes_no_answer"),
        col("ann.long_answer.start_token").as("long_answer_start"),
        col("ann.long_answer.end_token").as("long_answer_end"),
        col("ann.long_answer.candidate_index").as("candidate_index"),
        coalesce(shortAns.getField("start_token"), lit(-1L)).as("short_answer_start"),
        coalesce(shortAns.getField("end_token"), lit(-1L)).as("short_answer_end"),
        col("candidates"))
  }

  /** Extractor + `create_relevance_dataset` fused into relational form.
    *
    * Input columns: `example_id` (long), `question_text`,
    * `document_text`, `long_answer_start`, `long_answer_end`,
    * `candidate_index` (-1 = no long answer), `candidates:
    * array<struct<start_token, end_token, top_level>>`.
    *
    * Returns one frame with `question, text, label, tie, with_table`
    * where label 1 rows are the relevant excerpts and label 0 rows the
    * other top-level candidates (candidate at `candidate_index`
    * excluded — nq_extractor.py:117-124), `tie` is the deterministic
    * per-row key used downstream for seeded sampling, and `with_table`
    * is the `<Table>` routing flag (nq_curator.py:131-141). HTML strip
    * and the shortness / both-labels filters are NOT applied here —
    * they are text-side-only concerns (see [[textDataset]]).
    */
  def relevanceRows(nq: DataFrame, dropNoLongAnswer: Boolean = true): DataFrame = {
    val base0 = if (dropNoLongAnswer) nq.filter(col("candidate_index") =!= -1) else nq
    val base  = base0.withColumn("_toks", split(col("document_text"), " "))
    // tie = md5 over (example_id, candidate slot): collision-free for
    // real NQ scale (an `example_id * smallConst + cand_idx` form
    // collides across examples once cand_idx exceeds the constant —
    // real documents carry hundreds of candidates — and overflows
    // ANSI long arithmetic at real NQ example_id magnitudes ~1e18);
    // the hex string is its own cross-engine shuffle order (same
    // lexicographic order in Spark and DuckDB).
    val pos = base.select(
      col("question_text").as("question"),
      textSection(col("_toks"), col("long_answer_start"), col("long_answer_end")).as("text"),
      lit(1).as("label"),
      md5(concat(col("example_id"), lit(":p"))).as("tie"))
    val neg = base
      .select(col("question_text").as("question"), col("_toks"), col("example_id"),
        col("candidate_index"), posexplode(col("candidates")).as(Seq("cand_idx", "cand")))
      .filter(col("cand_idx") =!= col("candidate_index") && col("cand.top_level"))
      .select(
        col("question"),
        textSection(col("_toks"), col("cand.start_token"), col("cand.end_token")).as("text"),
        lit(0).as("label"),
        md5(concat(col("example_id"), lit(":"), col("cand_idx"))).as("tie"))
    pos.unionByName(neg)
      .withColumn("with_table", TextFns.containsTable(col("text")))
  }

  /** The text-side dataset: rows without `<Table>`, HTML-stripped,
    * shortness-filtered, keeping only questions that retain both a
    * positive and a negative (nq_curator.py:143-162). The both-labels
    * filter is a min/max window over `question` — the same partition
    * key [[balancedDataset]] needs next, so the filter adds no
    * exchange of its own.
    */
  def textDataset(rows: DataFrame, minTokens: Int = 10): DataFrame = {
    val stripped = rows
      .filter(!col("with_table"))
      .withColumn("text", TextFns.removeHtmlTags(col("text")))
      .filter(TextFns.isNotShort(col("text"), minTokens))
    val w = Window.partitionBy(col("question"))
    stripped
      .withColumn("_mx", max(col("label")).over(w))
      .withColumn("_mn", min(col("label")).over(w))
      .filter(col("_mx") === 1 && col("_mn") === 0)
      .drop("_mx", "_mn")
  }

  /** The table-side dataset: rows containing `<Table>`, kept verbatim
    * (no strip / shortness / both-labels — nq_curator.py:134-141).
    */
  def tableDataset(rows: DataFrame): DataFrame =
    rows.filter(col("with_table"))

  /** `_build_balanced_dataset` (nq_curator.py:164-196): all positives
    * plus ONE negative per question — the first in seeded-shuffle
    * order, re-expressed as a DetHash-ordered window — optionally
    * reassigning the negatives' questions by a deterministic
    * rank-join "shuffle" (`negative_from_other_docs`: the negative
    * paragraph keeps its text but is paired with another question, so
    * it no longer comes from the positive's own document).
    *
    * The rank join runs over the one-negative-per-question frame: a
    * global row_number on |questions| rows. That frame is the already-
    * reduced output side (one row per question), orders of magnitude
    * smaller than the candidate corpus; if even that outgrows a single
    * sort at extreme scale, substitute a hash-rotate pairing — the
    * reference semantics only require a derangement-ish permutation.
    */
  def balancedDataset(df: DataFrame, negativeFromOtherDocs: Boolean = true): DataFrame = {
    val pos     = df.filter(col("label") === 1)
    val negCand = df.filter(col("label") === 0)
    // the md5-hex tie IS the seeded-shuffle order (uniform, identical
    // lexicographic order in both engines, collision-free per row)
    val wq = Window.partitionBy(col("question")).orderBy(col("tie"))
    val firstNeg = negCand
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val neg =
      if (!negativeFromOtherDocs) firstNeg
      else {
        // pandas: groupby("question").first() yields question-sorted
        // rows; the shuffled question column is assigned positionally.
        val bodies = firstNeg
          .withColumn("_r", row_number().over(Window.orderBy(col("question"))))
          .drop("question")
        val qs = firstNeg.select(
          col("question"),
          row_number().over(
            Window.orderBy(md5(concat(lit("shuf:"), col("question"))), col("question"))).as("_r"))
        bodies.join(qs, Seq("_r")).drop("_r")
      }
    pos.select(col("question"), col("text"), col("label"))
      .unionByName(neg.select(col("question"), col("text"), col("label")))
  }
}
