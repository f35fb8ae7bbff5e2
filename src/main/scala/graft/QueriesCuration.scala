package graft

import graft.GraftSession.table
import graft.ops.Curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation chain end-to-end as one oracle-checked query
  * (SURVEY §3.2 / §7.3: filter → stringified-list parse →
  * multi-paragraph split → KPI-question broadcast join with year
  * templating → clean → deterministic dedup). Annotations are
  * fabricated from `documents` with the reference's cell shapes
  * (stringified list cells, float kpi ids, excluded companies,
  * mixed data types); paragraph texts are drawn from a 25-doc pool so
  * (question, context) collisions actually exercise the dedup.
  */
object QueriesCuration {

  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")

  private def kpiMapping(s: SparkSession): DataFrame =
    s.createDataFrame(Seq(
      (1.0, "what is metric one?", false),
      (2.0, "what is metric two?", false),
      (3.0, "what is metric three?", true)
    )).toDF("kpi_id", "question", "add_year")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_curation_dataset" -> ((s, dir) => {
      val pool = docs(s, dir).select(col("doc_id").as("pool_id"), col("text").as("pool_text"))
      val ann = docs(s, dir).filter(col("doc_id") < 40)
        .select(col("doc_id"))
        .join(pool, pmod(col("doc_id"), lit(25)) === col("pool_id"))
        .select(
          concat(lit("CMP"), pmod(col("doc_id"), lit(5))).as("company"),
          col("doc_id").as("annotator"),
          concat(lit("src"), col("doc_id")).as("source_file"),
          concat(lit("["), pmod(col("doc_id"), lit(3)) + 1, lit("]")).as("source_page"),
          (pmod(col("doc_id"), lit(25)) % 3 + 1).cast("double").as("kpi_id"),
          (lit(2015) + pmod(col("doc_id"), lit(4))).as("year"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("TABLE")).otherwise(lit("TEXT")).as("data_type"),
          concat(lit("[\""), substring(col("pool_text"), 1, 30), lit("\", \""),
            substring(col("pool_text"), 32, 30), lit("\"]")).as("relevant_paragraphs")
        )
      val parsed = Curation.parseListCells(
        Curation.curationFilter(ann, "TEXT", Seq("CMP1")))
      val pos = Curation.posExamples(parsed, kpiMapping(s))
      Curation.dedupExamples(pos, Seq(col("annotator").asc))
        .select(col("question"), col("context"), col("label"),
          col("kpi_id"), col("page"), col("source_file"), col("annotator"))
        .orderBy(col("question"), col("context"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "c1_curation_dataset" ->
      """WITH ann AS (
        | SELECT d.doc_id AS annotator,
        |  'CMP' || CAST(d.doc_id % 5 AS VARCHAR) AS company,
        |  'src' || CAST(d.doc_id AS VARCHAR) AS source_file,
        |  d.doc_id % 3 + 1 AS src_page,
        |  CAST(d.doc_id % 25 % 3 + 1 AS DOUBLE) AS kpi_id,
        |  2015 + d.doc_id % 4 AS year,
        |  CASE WHEN d.doc_id % 7 = 0 THEN 'TABLE' ELSE 'TEXT' END AS data_type,
        |  substr(p.text, 1, 30) AS para1, substr(p.text, 32, 30) AS para2
        | FROM documents d JOIN documents p ON p.doc_id = d.doc_id % 25
        | WHERE d.doc_id < 40),
        |kept AS (SELECT * FROM ann WHERE data_type = 'TEXT' AND company <> 'CMP1'),
        |exploded AS (
        | SELECT annotator, source_file, kpi_id, year, src_page - 1 AS page, para1 AS paragraph FROM kept
        | UNION ALL
        | SELECT annotator, source_file, kpi_id, year, src_page - 1, para2 FROM kept),
        |q(kpi_id, question, add_year) AS (VALUES
        | (CAST(1 AS DOUBLE), 'what is metric one?', false),
        | (CAST(2 AS DOUBLE), 'what is metric two?', false),
        | (CAST(3 AS DOUBLE), 'what is metric three?', true)),
        |pos AS (
        | SELECT e.*, CASE WHEN q.add_year
        |   THEN split_part(q.question, '?', 1) || ' in year ' || CAST(e.year AS VARCHAR) || '?'
        |   ELSE q.question END AS question,
        |  e.paragraph AS context, 1 AS label
        | FROM exploded e JOIN q ON e.kpi_id = q.kpi_id),
        |deduped AS (
        | SELECT *, row_number() OVER (PARTITION BY question, context ORDER BY annotator ASC) AS rn
        | FROM pos)
        |SELECT question, context, label, kpi_id, page, source_file, annotator
        |FROM deduped WHERE rn = 1
        |ORDER BY question, context""".stripMargin
  )
}
