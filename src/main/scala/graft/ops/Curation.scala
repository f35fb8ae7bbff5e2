package graft.ops

import graft.functions.{DetHash, ListParse, TextFns}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation stage: turn annotation rows + extracted paragraphs into
  * labeled training examples (SURVEY §2 P2-P7, R1-R3, M5-M7;
  * reference: src/components/preprocessing/text_curator.py,
  * kpi_inference_curator.py).
  *
  * The reference iterates rows and draws samples from Python RNGs; the
  * engine re-expresses each step as a dataframe transform with
  * key-hash-seeded determinism, so results are reproducible under any
  * partitioning and the whole stage is shuffle-minimal: every join
  * against the annotation side is a broadcast (annotations are small
  * dims next to the paragraph corpus).
  */
object Curation {

  /** P2: the curation predicate — rows of the wanted data_type with
    * parseable relevant_paragraphs, excluding named companies
    * (text_curator.py:129-133).
    */
  def curationFilter(annotations: DataFrame, dataType: String, excludedCompanies: Seq[String]): DataFrame =
    annotations
      .filter(col("data_type") === dataType)
      .filter(col("relevant_paragraphs").isNotNull)
      .filter(!col("company").isin(excludedCompanies: _*))

  /** Parse the stringified list cells into typed arrays, dropping rows
    * the reference drops (unparseable source_page / paragraphs;
    * qa_utils.py:93-112, kpi_inference_curator.py:194-271).
    */
  def parseListCells(annotations: DataFrame): DataFrame =
    annotations
      .withColumn("source_pages", ListParse.parseSourcePages(col("source_page")))
      .withColumn("paragraphs", ListParse.parseParagraphList(col("relevant_paragraphs")))
      .filter(col("source_pages").isNotNull && col("paragraphs").isNotNull)

  /** R2: `split_multi_paragraph` — one page × n paragraphs broadcasts
    * the page; n pages × n paragraphs zip-explode index-aligned; any
    * other shape is silently dropped
    * (kpi_inference_curator.py:149-192, including the silent drop).
    * Pages shift 1-based → 0-based here (F8, text_curator.py:217).
    */
  def splitMultiParagraph(parsed: DataFrame): DataFrame = {
    val onePage = parsed
      .filter(size(col("source_pages")) === 1)
      .select(col("*"), explode(col("paragraphs")).as("paragraph"))
      .withColumn("page", element_at(col("source_pages"), 1) - 1)
    val zipped = parsed
      .filter(size(col("source_pages")) > 1 && size(col("source_pages")) === size(col("paragraphs")))
      .select(col("*"), explode(arrays_zip(col("source_pages"), col("paragraphs"))).as("z"))
      .withColumn("page", col("z.source_pages") - 1)
      .withColumn("paragraph", col("z.paragraphs"))
      .drop("z")
    onePage.unionByName(zipped).drop("source_pages", "paragraphs")
  }

  /** Positive examples: curated annotations joined to their KPI
    * question (broadcast J2 + F10 year templating), paragraph text
    * cleaned, label 1 (text_curator.py:150-188).
    */
  def posExamples(parsed: DataFrame, kpiMapping: DataFrame): DataFrame =
    splitMultiParagraph(parsed)
      .join(broadcast(kpiMapping.select(col("kpi_id"), col("question"), col("add_year"))), Seq("kpi_id"))
      .withColumn("question", TextFns.templateQuestion(col("question"), col("year"), col("add_year")))
      .drop("add_year")
      .withColumn("context", TextFns.cleanText(col("paragraph")))
      .withColumn("label", lit(1))

  /** Negative examples, engine semantics (deterministic form of
    * text_curator.py:190-258): for each positive row, the candidate
    * pool is every paragraph of the same pdf on a page >= 3 that is
    * not one of the row's source pages and whose cleaned text is at
    * least `minLength` chars; keep `negPosRatio` candidates per row,
    * chosen by key-hash order (stable under repartitioning, unlike the
    * reference's rejection-sampling loop whose constraints —
    * page >= 3, != source, len >= min — are preserved exactly).
    */
  def negExamples(
      parsed: DataFrame,
      paragraphs: DataFrame, // (pdf_name, page, para_idx, paragraph) 0-based pages
      negPosRatio: Int,
      minLength: Int,
      rowKeyCol: String = "row_key" // caller-supplied integer key per positive row
  ): DataFrame = {
    // The caller provides the per-row integer key: a generated id
    // (monotonically_increasing_id) would be partition-dependent and
    // break rerun determinism at scale. The candidate pick is a pure
    // arithmetic DetHash of (row, page, paragraph) — SQL-replicable.
    val rows = parsed
      .withColumn("neg_pages", transform(col("source_pages"), p => p - 1))
    val cand = rows
      .join(
        paragraphs.select(
          col("pdf_name").as("source_file"),
          col("page").as("cand_page"),
          col("para_idx"),
          col("paragraph").as("cand_paragraph")
        ),
        Seq("source_file")
      )
      .filter(col("cand_page") >= 3)
      .filter(!array_contains(col("neg_pages"), col("cand_page")))
      .withColumn("context", TextFns.cleanText(col("cand_paragraph")))
      .filter(length(col("context")) >= minLength)
    val pick = DetHash.detUnit(
      col(rowKeyCol) * lit(1000003L) + col("cand_page") * lit(101L) + col("para_idx"))
    val w = Window.partitionBy(col(rowKeyCol)).orderBy(pick.asc, col("cand_page").asc, col("para_idx").asc)
    cand
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= negPosRatio)
      .drop("__rn", "neg_pages", "cand_page", "para_idx", "cand_paragraph")
      .withColumn("label", lit(0))
  }

  /** P5: dedup keep-first per (question, context) (text_curator.py:101). */
  def dedupExamples(examples: DataFrame, order: Seq[Column]): DataFrame =
    Dedup.dedupKeepFirst(examples, Seq("question", "context"), order)

  /** M5: deterministic train/val split — val iff keyhash < ratio.
    * Replaces `train_test_split(dev_split)` (farm_trainer.py:74-77)
    * with a partition-stable rule.
    */
  def trainValSplit(df: DataFrame, key: Column, valRatio: Double): (DataFrame, DataFrame) = {
    // cast to long BEFORE abs: abs(Int.MinValue) overflows, which under
    // ANSI mode kills the job (2^-32 per row — certain on a large corpus)
    val u = DetHash.detUnit(abs(hash(key).cast("long")))
    (df.filter(u >= valRatio), df.filter(u < valRatio))
  }

  /** R6: nest curated QA rows into the SQuAD v2 tree
    * (base_kpi_inference_curator.py:61-127). collect_list order is
    * made explicit (sort by qa id / context) — the reference relies on
    * first-occurrence order, which no parallel engine can promise.
    */
  def buildSquad(df: DataFrame): DataFrame = {
    val qas = df
      .withColumn(
        "qa",
        struct(
          col("question"),
          col("id"),
          (size(col("answer_start")) === 0).as("is_impossible"),
          transform(col("answer_start"), s => struct(col("answer").as("text"), s.as("answer_start"))).as("answers")
        )
      )
      .groupBy(col("source_file"), col("paragraph"))
      .agg(array_sort(collect_list(col("qa"))).as("qas"))
    val paragraphs = qas
      .withColumn("par", struct(col("paragraph").as("context"), col("qas")))
      .groupBy(col("source_file"))
      .agg(array_sort(collect_list(col("par"))).as("paragraphs"))
    paragraphs.select(
      col("source_file").as("title"),
      col("paragraphs")
    )
  }

  /** Serialize the SQuAD tree to the reference's JSON envelope. */
  def squadJson(squad: DataFrame): DataFrame =
    squad.agg(
      to_json(
        struct(
          lit("v2.0").as("version"),
          array_sort(collect_list(struct(col("title"), col("paragraphs")))).as("data")
        )
      ).as("squad_json")
    )
}
