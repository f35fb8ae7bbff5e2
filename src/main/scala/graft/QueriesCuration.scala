package graft

import graft.GraftSession.table
import graft.functions.DetHash
import graft.ops.{Curation, Dedup, NqCuration, QaCuration, TableCuration}

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

  /** NQ-shaped fixture fabricated from `documents` (doc_id < 60):
    * `document_text` is the doc's whitespace tokens plus an appended
    * `<Table>…</Table>` block and a too-short `<P>…</P>` block, so the
    * candidate spans exercise every routing path of the NQ chain —
    * table split (doc_id%8 long answers, %3 candidates, plus natural
    * spill for short docs whose spans reach the appended region),
    * shortness drop (%9 long answers, the `<P>` span), the
    * no-long-answer extractor drop (%13 → candidate_index -1), the
    * top-level filter (%7 / %2 knockouts, which also starve some
    * questions of negatives so the both-labels filter is live), and a
    * multi-negative pick for %2 docs so the DetHash first-negative
    * order matters.
    */
  private def nqFixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 60)
    val n = size(split(col("text"), " "))
    val laS = when(pmod(col("doc_id"), lit(8)) === 0, n).otherwise(lit(1))
    val laE = when(pmod(col("doc_id"), lit(8)) === 0, n + lit(4))
      .when(pmod(col("doc_id"), lit(9)) === 0, lit(9))
      .otherwise(lit(15))
    d.select(
      col("doc_id").as("example_id"),
      concat(lit("q"), lpad(col("doc_id").cast("string"), 3, "0")).as("question_text"),
      concat(col("text"), lit(" <Table> tA tB </Table> <P> tiny bit </P>")).as("document_text"),
      when(pmod(col("doc_id"), lit(13)) === 0, lit(-1)).otherwise(lit(0)).as("candidate_index"),
      laS.as("long_answer_start"),
      laE.as("long_answer_end"),
      array(
        struct(laS.as("start_token"), laE.as("end_token"), lit(true).as("top_level")),
        struct(lit(2).as("start_token"), lit(16).as("end_token"),
          (pmod(col("doc_id"), lit(7)) =!= 0).as("top_level")),
        struct(n.as("start_token"), (n + lit(4)).as("end_token"),
          (pmod(col("doc_id"), lit(3)) === 0).as("top_level")),
        struct((n + lit(4)).as("start_token"), (n + lit(8)).as("end_token"),
          lit(true).as("top_level")),
        struct(lit(3).as("start_token"),
          (lit(15) + pmod(col("doc_id"), lit(3))).cast("int").as("end_token"),
          (pmod(col("doc_id"), lit(2)) === 0).as("top_level"))
      ).as("candidates"))
  }

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
    }),

    // C2: the QA (SQuAD) curation chain end-to-end — answerable +
    // extra-answerable mining + unanswerable-from-relevance + FARM
    // shift + keep-first dedup (kpi_inference_curator.py:362-425).
    // Annotations are fabricated from `documents` (source = pdf,
    // doc_id/20 = 0-based page); every ann row of doc_id%5==0 answers
    // with the paragraph's FIRST token so the FARM start==0 shift path
    // is live under the oracle.
    "c2_qa_curation" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id"), col("source"), col("text"),
        floor(col("doc_id") / 20).cast("long").as("page0"))
      val toks = Dedup.tokens(col("text"))
      val questions = kpiMapping(s).select(col("kpi_id"), col("question"))
      val ann = base.filter(col("doc_id") < 30)
        .select(
          col("doc_id").as("tie"),
          col("source").as("source_file"),
          col("page0"),
          (col("page0") + 1).as("src_page"),
          (pmod(col("doc_id"), lit(3)) + 1).cast("double").as("kpi_id"),
          when(pmod(col("doc_id"), lit(5)) === 0, element_at(toks, 1))
            .otherwise(element_at(toks, 4)).as("answer"),
          col("text").as("paragraph"))
        .join(broadcast(questions), Seq("kpi_id"))
      val cand = base.select(
        col("source").as("source_file"), col("page0").as("cand_page"),
        col("doc_id").as("tie"), col("text").as("paragraph"))
      val pos   = QaCuration.answerable(ann)
      val extra = QaCuration.extraAnswerable(ann.drop("tie"), cand, skipKpiIds = Seq(1.0))
      val rel = base
        .crossJoin(broadcast(questions.withColumn("q_idx", col("kpi_id").cast("long"))))
        .withColumn("tie", col("doc_id") * 4 + col("q_idx"))
        .filter(DetHash.detUnit(col("tie")) >= 0.7)
        .select(col("source").as("pdf_name"), (col("page0") + 1).as("page_viewer"),
          col("question").as("text"), col("text").as("text_b"), col("tie"))
      val unans = QaCuration.unanswerable(rel,
        ann.select(col("source_file"), col("src_page"), col("question"), col("answer")))
      QaCuration.qaDataset(Seq(pos, extra, unans))
        .select(col("source_file"), col("question"), col("paragraph"), col("answer"),
          array_join(col("answer_start").cast("array<string>"), ",").as("starts"),
          when(size(col("answer_start")) === 0, 1).otherwise(0).as("is_impossible"))
        .orderBy(col("question"), col("paragraph"), col("answer"))
    }),

    // C4: the NQ relevance-dataset chain end-to-end
    // (nq_extractor.py:84-140 + nq_curator.py:100-196): candidate
    // extraction → table split → HTML strip → shortness → both-labels
    // → DetHash first-negative-per-question → question-shuffle
    // cross-doc negatives → balanced union.
    "c4_nq_curation" -> ((s, dir) => {
      val rows = NqCuration.relevanceRows(nqFixture(s, dir))
      NqCuration.balancedDataset(NqCuration.textDataset(rows), negativeFromOtherDocs = true)
        .orderBy(col("question"), col("label"), col("text"))
    }),

    // C4b: the table-side flavor of the same chain — no strip /
    // shortness / both-labels (nq_curator.py:134-141), balanced with
    // negative_from_other_docs=False so the non-shuffled branch is
    // also live under the oracle.
    "c4_nq_table" -> ((s, dir) => {
      val rows = NqCuration.relevanceRows(nqFixture(s, dir))
      NqCuration.balancedDataset(NqCuration.tableDataset(rows), negativeFromOtherDocs = false)
        .orderBy(col("question"), col("label"), col("text"))
    }),

    // C3: the TABLE curation chain (table_curator.py:94-191) —
    // filename→(pdf, page) meta parse, per-page fuzzy argmax positive
    // (native token_set_ratio), same-pdf + pooled cross-pdf negative
    // sampling. Tables are fabricated 3-per-(source, page s%2) slot so
    // the argmax has real competition and page (1 - s%2) is empty
    // (the reference's skip-the-page path); annotations exercise the
    // data_type filter (doc_id%7), company exclusion (CMP3), the
    // invalid-kpi drop (kpi 4), and the F7 pdf-name fix.
    "c3_table_curation" -> ((s, dir) => {
      import graft.functions.TextFns
      val d = docs(s, dir)
      // % 11 knockout starves some pdfs below the neg ratio so the
      // pooled cross-pdf top-up path is live under the oracle
      val tables = d.filter(col("doc_id") < 60 && pmod(col("doc_id"), lit(11)) =!= 0).select(
        concat(col("source"), lit("_page"), pmod(col("doc_id"), lit(2)),
          lit("_"), col("doc_id"), lit(".csv")).as("table_filename"),
        substring(col("text"), 1, 80).as("table_text"))
      val annRaw = d.filter(col("doc_id") < 24).select(
        col("doc_id").as("row_key"),
        concat(lit("CMP"), pmod(col("doc_id"), lit(5))).as("company"),
        col("source").as("source_file"),
        (lit(2015) + pmod(col("doc_id"), lit(4))).as("year"),
        (pmod(col("doc_id"), lit(4)) + 1).cast("double").as("kpi_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit("TEXT")).otherwise(lit("TABLE")).as("data_type"),
        substring(col("text"), 11, 30).as("answer"),
        array(lit(0), lit(1)).as("pages"))
      val ann = annRaw
        .filter(col("data_type") === "TABLE" && !col("company").isin("CMP3"))
        .join(broadcast(kpiMapping(s).select(col("kpi_id"), col("question"))), Seq("kpi_id"))
        .withColumn("source_file", TextFns.fixPdfName(col("source_file")))
      TableCuration.dataset(ann, tables,
          (t, a) => call_function("token_set_ratio", t, a), negPosRatio = 2, poolSize = 12)
        .select(col("company"), col("year"), col("question"),
          coalesce(col("answer"), lit("")).as("answer"), col("table_filename"), col("label"))
        .orderBy(col("company"), col("year"), col("question"), col("label"),
          col("table_filename"), col("answer"))
    }),

    // C5: domain-authority-weighted corpus selection — the chain the
    // round-6 operators compose into: link-inject → integer PageRank
    // over the host graph (LinkGraph) → per-doc quality gate
    // (gopherFilter) → authority × size score in exact integers →
    // deterministic top-3 per source. A CommonCrawl-style curation
    // pass: quality rules drop junk, site authority ranks what
    // remains, the whole pipeline stays hash-checkable because every
    // stage is integer/deterministic.
    "c5_authority_curation" -> ((s, dir) => {
      import graft.ops.{CorpusOps, LinkGraph}
      val d = table(s, dir, "documents")
      val linked = d.select(col("doc_id"), col("source"), concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit(" see https://example"), pmod(col("doc_id"), lit(7)), lit(".com/path/a"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(6)) === 0,
          lit(" and http://Data.org/x?q=1")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" ref https://src"), pmod(col("doc_id"), lit(20)), lit(".site/home"))).otherwise(lit(""))).as("text"))
      val edges = CorpusOps.extractUrls(linked.select(col("doc_id"), col("text")), "doc_id", "text")
        .join(linked.select(col("doc_id"), col("source")), "doc_id")
        .select(concat(col("source"), lit(".site")).as("src"), col("domain").as("dst"))
      val ranks = LinkGraph.pageRank(edges, iters = 3).select(col("host"), col("rank"))
      val kept = CorpusOps.gopherFilter(d, "text",
          minTokens = 20, maxTokens = 80, minStopwordHits = 1)
        .filter(col("keep"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          concat(col("source"), lit(".site")).as("host"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("score").desc, col("doc_id"))
      kept
        .join(ranks, Seq("host"), "left")
        .withColumn("score", coalesce(col("rank"), lit(0L)) * col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("source"), col("doc_id"), col("score"), col("rk"))
        .orderBy(col("source"), col("rk"))
    })
  )

  /** Shared DuckDB prefix for the c4 oracles: the NQ fixture, candidate
    * spans (role 0 = long answer, 1-4 = other candidates), extraction
    * filters, and the `<Table>` routing flag — mirroring [[nqFixture]]
    * + [[graft.ops.NqCuration.relevanceRows]] arithmetic exactly.
    */
  private val nqOraclePrefix: String =
    """WITH f AS (
      | SELECT doc_id AS example_id, doc_id,
      |  'q' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS question,
      |  string_split(text || ' <Table> tA tB </Table> <P> tiny bit </P>', ' ') AS toks,
      |  len(string_split(text, ' ')) AS n
      | FROM documents WHERE doc_id < 60 AND doc_id % 13 <> 0),
      |g AS (
      | SELECT *,
      |  CASE WHEN doc_id % 8 = 0 THEN n ELSE 1 END AS la_s,
      |  CASE WHEN doc_id % 8 = 0 THEN n + 4 WHEN doc_id % 9 = 0 THEN 9 ELSE 15 END AS la_e
      | FROM f),
      |cand AS (
      | SELECT g.*, r.role,
      |  CASE r.role WHEN 0 THEN la_s WHEN 1 THEN 2 WHEN 2 THEN n WHEN 3 THEN n + 4 ELSE 3 END AS s,
      |  CASE r.role WHEN 0 THEN la_e WHEN 1 THEN 16 WHEN 2 THEN n + 4 WHEN 3 THEN n + 8
      |              ELSE 15 + doc_id % 3 END AS e,
      |  CASE r.role WHEN 0 THEN true WHEN 1 THEN doc_id % 7 <> 0 WHEN 2 THEN doc_id % 3 = 0
      |              WHEN 3 THEN true ELSE doc_id % 2 = 0 END AS top
      | FROM g, (VALUES (0),(1),(2),(3),(4)) r(role)),
      |rows_ AS (
      | SELECT question,
      |  coalesce(array_to_string(list_slice(toks, s + 1, e), ' '), '') AS text,
      |  CASE WHEN role = 0 THEN 1 ELSE 0 END AS label,
      |  CASE WHEN role = 0 THEN md5(example_id || ':p') ELSE md5(example_id || ':' || role) END AS tie
      | FROM cand WHERE role = 0 OR top),
      |tb AS (SELECT *, regexp_matches(text, '<Table>.*</Table>') AS with_table FROM rows_)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "c4_nq_curation" -> {
      // the md5-hex tie is its own shuffle order (see NqCuration)
      s"""$nqOraclePrefix,
         |txt AS (
         | SELECT question, regexp_replace(text, '<[^>]+>\\s?', '', 'g') AS text, label, tie
         | FROM tb WHERE NOT with_table),
         |txt2 AS (SELECT * FROM txt WHERE len(string_split(text, ' ')) > 10),
         |bl AS (
         | SELECT * FROM (
         |  SELECT *, max(label) OVER (PARTITION BY question) AS mx,
         |            min(label) OVER (PARTITION BY question) AS mn FROM txt2)
         | WHERE mx = 1 AND mn = 0),
         |fneg AS (
         | SELECT * FROM (
         |  SELECT question, text, label, tie,
         |   row_number() OVER (PARTITION BY question ORDER BY tie) AS rn
         |  FROM bl WHERE label = 0) WHERE rn = 1),
         |bodies AS (SELECT text, label, row_number() OVER (ORDER BY question) AS r FROM fneg),
         |qs AS (SELECT question,
         |        row_number() OVER (ORDER BY md5('shuf:' || question), question) AS r FROM fneg)
         |SELECT question, text, label FROM bl WHERE label = 1
         |UNION ALL
         |SELECT qs.question, b.text, b.label FROM bodies b JOIN qs USING (r)
         |ORDER BY question, label, text""".stripMargin
    },
    "c4_nq_table" -> {
      s"""$nqOraclePrefix,
         |tbl AS (SELECT question, text, label, tie FROM tb WHERE with_table),
         |fneg AS (
         | SELECT * FROM (
         |  SELECT question, text, label, tie,
         |   row_number() OVER (PARTITION BY question ORDER BY tie) AS rn
         |  FROM tbl WHERE label = 0) WHERE rn = 1)
         |SELECT question, text, label FROM tbl WHERE label = 1
         |UNION ALL
         |SELECT question, text, label FROM fneg
         |ORDER BY question, label, text""".stripMargin
    },
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
        |ORDER BY question, context""".stripMargin,
    "c2_qa_curation" -> {
      val u = DetHash.detUnitSql("b.doc_id * 4 + CAST(q.kpi_id AS BIGINT)")
      def starts(par: String, ans: String) =
        s"""list_filter(range(0, length($par) - length($ans) + 1),
           |   i -> substr($par, CAST(i + 1 AS INT), CAST(length($ans) AS INT)) = $ans)""".stripMargin
      s"""WITH base AS (SELECT doc_id, source, text, doc_id // 20 AS page0 FROM documents),
         |q(kpi_id, question) AS (VALUES
         | (CAST(1 AS DOUBLE), 'what is metric one?'),
         | (CAST(2 AS DOUBLE), 'what is metric two?'),
         | (CAST(3 AS DOUBLE), 'what is metric three?')),
         |ann AS (
         | SELECT b.doc_id AS tie, b.source AS source_file, b.page0, b.page0 + 1 AS src_page,
         |  CAST(b.doc_id % 3 + 1 AS DOUBLE) AS kpi_id,
         |  CASE WHEN b.doc_id % 5 = 0 THEN list_filter(string_split(b.text, ' '), x -> x <> '')[1]
         |       ELSE list_filter(string_split(b.text, ' '), x -> x <> '')[4] END AS answer,
         |  b.text AS paragraph, q.question
         | FROM base b JOIN q ON CAST(b.doc_id % 3 + 1 AS DOUBLE) = q.kpi_id
         | WHERE b.doc_id < 30),
         |pos0 AS (SELECT *, ${starts("paragraph", "answer")} AS st FROM ann),
         |pos AS (SELECT source_file, question,
         |  CASE WHEN list_contains(st, 0) THEN ' ' || paragraph ELSE paragraph END AS paragraph,
         |  answer,
         |  CASE WHEN list_contains(st, 0) THEN list_transform(st, s -> s + 1) ELSE st END AS answer_start,
         |  0 AS priority, tie
         | FROM pos0 WHERE len(st) > 0),
         |ex0 AS (SELECT a.source_file, a.question, c.text AS paragraph, a.answer, c.doc_id AS tie,
         |  ${starts("c.text", "a.answer")} AS st
         | FROM ann a JOIN base c ON a.source_file = c.source AND c.page0 <> a.page0
         | WHERE a.kpi_id <> CAST(1 AS DOUBLE)),
         |ex AS (SELECT source_file, question,
         |  CASE WHEN list_contains(st, 0) THEN ' ' || paragraph ELSE paragraph END AS paragraph,
         |  answer,
         |  CASE WHEN list_contains(st, 0) THEN list_transform(st, s -> s + 1) ELSE st END AS answer_start,
         |  1 AS priority, tie
         | FROM ex0 WHERE len(st) > 0),
         |rel AS (SELECT b.source AS pdf_name, b.page0 + 1 AS page_viewer,
         |  q.question AS text, b.text AS text_b,
         |  b.doc_id * 4 + CAST(q.kpi_id AS BIGINT) AS tie
         | FROM base b CROSS JOIN q
         | WHERE $u >= 0.7),
         |unans AS (SELECT r.pdf_name AS source_file, r.text AS question, r.text_b AS paragraph,
         |  '' AS answer, CAST([] AS BIGINT[]) AS answer_start, 2 AS priority, r.tie
         | FROM rel r
         | WHERE EXISTS (SELECT 1 FROM ann a WHERE a.source_file = r.pdf_name)
         |  AND NOT EXISTS (SELECT 1 FROM ann a
         |   WHERE a.source_file = r.pdf_name AND a.src_page = r.page_viewer)
         |  AND NOT EXISTS (SELECT 1 FROM ann a
         |   WHERE a.source_file = r.pdf_name AND a.question = r.text
         |    AND strpos(r.text_b, a.answer) > 0)),
         |uni AS (SELECT * FROM pos UNION ALL SELECT * FROM ex UNION ALL SELECT * FROM unans),
         |dd AS (SELECT *, row_number() OVER (
         |  PARTITION BY answer, paragraph, question ORDER BY priority, tie) AS rn FROM uni)
         |SELECT source_file, question, paragraph, answer,
         | coalesce(array_to_string(list_transform(answer_start, z -> CAST(z AS VARCHAR)), ','), '') AS starts,
         | CASE WHEN len(answer_start) = 0 THEN 1 ELSE 0 END AS is_impossible
         |FROM dd WHERE rn = 1
         |ORDER BY question, paragraph, answer""".stripMargin
    },
    // C3: same chain in DuckDB — token_set_ratio replicated with the
    // f9 recursive-CTE InDel DP over the three sorted-token
    // reconstructions of every (table, answer) candidate; md5-keyed
    // sampling and the bounded pool mirror TableCuration exactly.
    "c3_table_curation" ->
      """WITH RECURSIVE
        |tables0 AS (
        | SELECT source || '_page' || (doc_id % 2) || '_' || doc_id || '.csv' AS table_filename,
        |        substr(text, 1, 80) AS table_text
        | FROM documents WHERE doc_id < 60 AND doc_id % 11 <> 0),
        |meta AS (
        | SELECT table_filename, table_text,
        |        trim(regexp_extract(table_filename, '^(.*)_page', 1)) || '.pdf' AS pdf_name,
        |        CAST(regexp_extract(table_filename, '_page([0-9]+)', 1) AS INT) AS page
        | FROM tables0),
        |q(kpi_id, question) AS (VALUES
        | (CAST(1 AS DOUBLE), 'what is metric one?'),
        | (CAST(2 AS DOUBLE), 'what is metric two?'),
        | (CAST(3 AS DOUBLE), 'what is metric three?')),
        |ann AS (
        | SELECT d.doc_id AS row_key, 'CMP' || (d.doc_id % 5) AS company,
        |        d.source || '.pdf' AS source_file, 2015 + d.doc_id % 4 AS year,
        |        substr(d.text, 11, 30) AS answer, q.question
        | FROM documents d JOIN q ON CAST(d.doc_id % 4 + 1 AS DOUBLE) = q.kpi_id
        | WHERE d.doc_id < 24 AND d.doc_id % 7 <> 0 AND d.doc_id % 5 <> 3),
        |pages AS (
        | SELECT a.*, p.page_idx, p.page
        | FROM ann a, (VALUES (0, 0), (1, 1)) p(page_idx, page)),
        |cand AS (
        | SELECT a.row_key, a.page_idx, a.company, a.year, a.question, a.answer,
        |        a.source_file, m.table_filename, m.table_text
        | FROM pages a JOIN meta m ON a.source_file = m.pdf_name AND a.page = m.page),
        |tok AS (
        | SELECT row_key, page_idx, table_filename,
        |  list_distinct(list_filter(string_split_regex(trim(lower(regexp_replace(table_text, '\W', ' ', 'g'))), '\s+'), t -> t <> '')) AS ta,
        |  list_distinct(list_filter(string_split_regex(trim(lower(regexp_replace(answer, '\W', ' ', 'g'))), '\s+'), t -> t <> '')) AS tb
        | FROM cand),
        |tss AS (
        | SELECT row_key, page_idx, table_filename,
        |  coalesce(array_to_string(list_sort(list_filter(ta, t -> list_contains(tb, t))), ' '), '') AS t0,
        |  trim(coalesce(array_to_string(list_sort(list_filter(ta, t -> list_contains(tb, t))), ' '), '') || ' ' ||
        |       coalesce(array_to_string(list_sort(list_filter(ta, t -> NOT list_contains(tb, t))), ' '), '')) AS t1,
        |  trim(coalesce(array_to_string(list_sort(list_filter(ta, t -> list_contains(tb, t))), ' '), '') || ' ' ||
        |       coalesce(array_to_string(list_sort(list_filter(tb, t -> NOT list_contains(ta, t))), ' '), '')) AS t2
        | FROM tok),
        |dpairs AS (
        | SELECT row_key || ':' || page_idx || ':' || table_filename || ':0' AS uid, t0 AS x, t1 AS y FROM tss
        | UNION ALL SELECT row_key || ':' || page_idx || ':' || table_filename || ':1', t0, t2 FROM tss
        | UNION ALL SELECT row_key || ':' || page_idx || ':' || table_filename || ':2', t1, t2 FROM tss),
        |dp AS (
        | SELECT uid, x, y, 0::BIGINT AS i,
        |        list_transform(range(0, CAST(len(y) AS BIGINT) + 1), z -> z) AS row
        | FROM dpairs
        | UNION ALL
        | SELECT uid, x, y, i + 1,
        |  list_reduce(
        |   [[i + 1]] || list_transform(range(1, CAST(len(y) AS BIGINT) + 1), j -> [j]),
        |   (acc, el) -> acc || [least(
        |     row[CAST(el[1] AS INT) + 1] + 1,
        |     acc[len(acc)] + 1,
        |     row[CAST(el[1] AS INT)] +
        |      CASE WHEN substr(x, CAST(i AS INT) + 1, 1) = substr(y, CAST(el[1] AS INT), 1)
        |           THEN 0 ELSE 2 END)]
        |  ) AS row
        | FROM dp WHERE i < len(x)),
        |scored AS (
        | SELECT uid,
        |  CASE WHEN len(x) + len(y) = 0 THEN 100
        |       ELSE CAST(round_even(100.0 * (len(x) + len(y) - row[CAST(len(y) AS BIGINT) + 1])
        |                            / (len(x) + len(y)), 0) AS INTEGER) END AS rt
        | FROM dp WHERE i = len(x)),
        |tsr AS (
        | SELECT c.*, greatest(s0.rt, s1.rt, s2.rt) AS score
        | FROM cand c
        | JOIN scored s0 ON s0.uid = c.row_key || ':' || c.page_idx || ':' || c.table_filename || ':0'
        | JOIN scored s1 ON s1.uid = c.row_key || ':' || c.page_idx || ':' || c.table_filename || ':1'
        | JOIN scored s2 ON s2.uid = c.row_key || ':' || c.page_idx || ':' || c.table_filename || ':2'),
        |pos AS (
        | SELECT * FROM (
        |  SELECT t.*, row_number() OVER (PARTITION BY row_key, page_idx
        |                                 ORDER BY score DESC, table_filename) AS rn
        |  FROM tsr t) WHERE rn = 1),
        |rows_ AS (
        | SELECT * FROM (
        |  SELECT row_key, company, year, question, source_file, table_filename AS pos_filename,
        |         row_number() OVER (PARTITION BY row_key ORDER BY page_idx) AS prn
        |  FROM pos) WHERE prn = 1),
        |same_ AS (
        | SELECT * FROM (
        |  SELECT r.row_key, r.company, r.year, r.question, m.table_filename,
        |         row_number() OVER (PARTITION BY r.row_key
        |                            ORDER BY md5(r.row_key || ':' || m.table_filename), m.table_filename) AS rn
        |  FROM rows_ r JOIN meta m ON m.pdf_name = r.source_file AND m.table_filename <> r.pos_filename)
        | WHERE rn <= 2),
        |pool AS (
        | SELECT table_filename AS pool_filename, pdf_name AS pool_pdf
        | FROM meta ORDER BY md5('pool:' || table_filename), table_filename LIMIT 12),
        |cnts AS (SELECT row_key, count(*) AS n_same FROM same_ GROUP BY row_key),
        |short AS (
        | SELECT r.*, coalesce(c.n_same, 0) AS n_same
        | FROM rows_ r LEFT JOIN cnts c USING (row_key)
        | WHERE coalesce(c.n_same, 0) < 2),
        |extra AS (
        | SELECT * FROM (
        |  SELECT s.row_key, s.company, s.year, s.question, p.pool_filename AS table_filename, s.n_same,
        |         row_number() OVER (PARTITION BY s.row_key
        |                            ORDER BY md5(s.row_key || ':' || p.pool_filename), p.pool_filename) AS rn
        |  FROM short s JOIN pool p ON p.pool_pdf <> s.source_file)
        | WHERE rn <= 2 - n_same),
        |unioned AS (
        | SELECT company, year, question, answer, table_filename, CAST(1 AS INTEGER) AS label FROM pos
        | UNION ALL
        | SELECT company, year, question, NULL, table_filename, CAST(0 AS INTEGER) FROM same_
        | UNION ALL
        | SELECT company, year, question, NULL, table_filename, CAST(0 AS INTEGER) FROM extra)
        |SELECT company, year, question, coalesce(answer, '') AS answer, table_filename, label
        |FROM unioned
        |ORDER BY company, year, question, label, table_filename, answer""".stripMargin,
    // C5 replay: the x_pagerank_hosts iteration CTEs + the
    // x_quality_filter rule CTEs + the integer score and window
    "c5_authority_curation" ->
      s"""WITH linked AS (
         | SELECT doc_id, source, text ||
         |  CASE WHEN doc_id % 4 = 0
         |   THEN ' see https://example' || (doc_id % 7) || '.com/path/a' ELSE '' END ||
         |  CASE WHEN doc_id % 6 = 0
         |   THEN ' and http://Data.org/x?q=1' ELSE '' END ||
         |  CASE WHEN doc_id % 3 = 0
         |   THEN ' ref https://src' || (doc_id % 20) || '.site/home' ELSE '' END AS t
         | FROM documents),
         |u AS (SELECT source, unnest(regexp_extract_all(t, '${graft.ops.CorpusOps.UrlRe}')) AS url
         | FROM linked),
         |e0 AS (SELECT DISTINCT source || '.site' AS src,
         |  lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS dst FROM u),
         |e AS (SELECT src, dst FROM e0 WHERE src <> dst),
         |nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
         |p AS (SELECT count(*) AS n FROM nodes),
         |outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT host, 1000000000000 // n AS rank FROM nodes CROSS JOIN p),
         |c1 AS (SELECT dst, sum((85 * rank) // (100 * outdeg)) AS c
         | FROM e JOIN r0 ON r0.host = e.src JOIN outd USING (src) GROUP BY 1),
         |r1 AS (SELECT host, (15 * 1000000000000) // (100 * n) + coalesce(c, 0) AS rank
         | FROM nodes CROSS JOIN p LEFT JOIN c1 ON c1.dst = host),
         |c2 AS (SELECT dst, sum((85 * rank) // (100 * outdeg)) AS c
         | FROM e JOIN r1 ON r1.host = e.src JOIN outd USING (src) GROUP BY 1),
         |r2 AS (SELECT host, (15 * 1000000000000) // (100 * n) + coalesce(c, 0) AS rank
         | FROM nodes CROSS JOIN p LEFT JOIN c2 ON c2.dst = host),
         |c3 AS (SELECT dst, sum((85 * rank) // (100 * outdeg)) AS c
         | FROM e JOIN r2 ON r2.host = e.src JOIN outd USING (src) GROUP BY 1),
         |r3 AS (SELECT host, (15 * 1000000000000) // (100 * n) + coalesce(c, 0) AS rank
         | FROM nodes CROSS JOIN p LEFT JOIN c3 ON c3.dst = host),
         |tq AS (
         | SELECT doc_id, source, n_chars, text,
         |  list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         | FROM documents),
         |m AS (
         | SELECT doc_id, source, n_chars,
         |  CAST(len(toks) AS DOUBLE) AS ntoks,
         |  CAST(len(text) AS DOUBLE) AS nchars,
         |  CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) AS symbol,
         |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in'], x))) AS stop_hits
         | FROM tq),
         |kept AS (
         | SELECT doc_id, source, n_chars FROM m
         | WHERE NOT (ntoks < 20 OR ntoks > 80
         |  OR (CASE WHEN ntoks > 0 THEN (nchars - (ntoks - 1)) / ntoks ELSE 0 END) < 3.0
         |  OR (CASE WHEN ntoks > 0 THEN (nchars - (ntoks - 1)) / ntoks ELSE 0 END) > 10.0
         |  OR (CASE WHEN nchars > 0 THEN symbol / nchars ELSE 0 END) > 0.1
         |  OR stop_hits < 1)),
         |scored AS (
         | SELECT k.source, k.doc_id,
         |  coalesce(CAST(r3.rank AS BIGINT), 0) * k.n_chars AS score
         | FROM kept k LEFT JOIN r3 ON r3.host = k.source || '.site'),
         |ranked AS (
         | SELECT source, doc_id, score,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS INT) AS rk
         | FROM scored)
         |SELECT source, doc_id, score, rk FROM ranked
         |WHERE rk <= 3 ORDER BY source, rk""".stripMargin
  )
}
