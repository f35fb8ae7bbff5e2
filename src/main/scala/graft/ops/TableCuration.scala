package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table (ESG_TABLE) curation: match annotated answers against extracted
  * table CSVs with fuzzy scoring, then sample table-flavor negatives
  * (reference: src/components/preprocessing/table_curator.py:94-191
  * `create_pos_examples` / `create_negative_examples` /
  * `find_relevant_table`, and `__create_table_meta` at 333-360).
  *
  * Scale shape: table metadata is one row per extracted CSV (filename +
  * concatenated cell text) — tiny next to the PDF corpus. Positives are
  * a keyed equi-join on (pdf, page) followed by fuzzy scoring of the
  * few tables on that page (never a cross join); negatives are a keyed
  * same-pdf join plus a bounded, broadcastable global pool for the
  * cross-pdf top-up, so no step touches |annotations| × |tables|.
  *
  * Determinism: the reference breaks argmax ties by `os.listdir` order
  * and samples negatives with a seeded global `random` stream — both
  * irreproducible under distribution. Engine semantics: ties break by
  * filename ascending; "random" sampling is an md5-ranked order keyed
  * by (row, filename), stable across partitionings and replicable in
  * SQL.
  */
object TableCuration {

  /** Parse "{pdf}_page{N}_{k}.csv" extraction filenames into
    * (pdf_name, page) columns (table_curator.py:348-359: pdf =
    * prefix before "_page" + ".pdf", page = the digits after).
    * Input needs `table_filename`; `table_text` rides along.
    */
  def tableMeta(tables: DataFrame): DataFrame =
    tables
      .withColumn("pdf_name",
        concat(trim(regexp_extract(col("table_filename"), "^(.*)_page", 1)), lit(".pdf")))
      .withColumn("page",
        regexp_extract(col("table_filename"), "_page([0-9]+)", 1).cast("int"))

  private def sampleKey(rowKey: Column, filename: Column): Column =
    md5(concat(rowKey.cast("string"), lit(":"), filename))

  /** Positive examples: for every (annotation row, source page), the
    * table on that (pdf, page) whose cell text best token_set-matches
    * the answer (find_relevant_table's argmax; first-listed → filename
    * asc). Pages without tables drop (the reference logs and skips).
    * `ann` needs (row_key, company, year, question, answer,
    * source_file, pages: array<int>); `meta` is `tableMeta` output.
    * Output keeps `row_key`/`page_idx` so negExamples can find each
    * row's first positive.
    */
  def posExamples(ann: DataFrame, meta: DataFrame, score: (Column, Column) => Column): DataFrame = {
    val exploded = ann.select(
      col("row_key"), col("company"), col("year"), col("question"),
      col("answer"), col("source_file"),
      posexplode(col("pages")).as(Seq("page_idx", "page")))
    val cand = exploded
      .join(meta, exploded("source_file") === meta("pdf_name") && exploded("page") === meta("page"))
      .withColumn("score", score(col("table_text"), col("answer")))
    val best = Window.partitionBy(col("row_key"), col("page_idx"))
      .orderBy(col("score").desc, col("table_filename").asc)
    cand
      .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("row_key"), col("page_idx"), col("company"), col("year"),
        col("question"), col("answer"), col("table_filename"), lit(1).as("label"))
  }

  /** Negative examples per annotation row (create_negative_examples):
    * up to `negPosRatio` same-pdf tables other than the row's first
    * positive, topped up from other pdfs when the same pdf has too few.
    * The cross-pdf pool is pre-ranked globally and truncated to
    * `poolSize` so the top-up join is against a broadcast-sized dim;
    * poolSize must exceed negPosRatio by the worst-case number of
    * same-pdf tables that need skipping.
    */
  def negExamples(pos: DataFrame, meta: DataFrame, negPosRatio: Int, poolSize: Int): DataFrame = {
    val firstPos = Window.partitionBy(col("row_key")).orderBy(col("page_idx").asc)
    val rows = pos
      .withColumn("rn", row_number().over(firstPos)).filter(col("rn") === 1)
      .select(col("row_key"), col("company"), col("year"), col("question"),
        col("source_file"), col("table_filename").as("pos_filename"))

    val perRow = Window.partitionBy(col("row_key"))
      .orderBy(col("sk").asc, col("table_filename").asc)
    val same = rows
      .join(meta, rows("source_file") === meta("pdf_name"))
      .filter(col("table_filename") =!= col("pos_filename"))
      .withColumn("sk", sampleKey(col("row_key"), col("table_filename")))
      .withColumn("rn", row_number().over(perRow)).filter(col("rn") <= negPosRatio)
      .select(col("row_key"), col("company"), col("year"), col("question"),
        col("table_filename"))

    // bounded global pool for the cross-pdf top-up (globally md5-ranked
    // so truncation is layout-independent); sort+limit plans as
    // TakeOrderedAndProject — partial per-partition top-k, no global
    // sort or single-partition window
    val pool = meta
      .withColumn("gk", md5(concat(lit("pool:"), col("table_filename"))))
      .orderBy(col("gk").asc, col("table_filename").asc).limit(poolSize)
      .select(col("table_filename").as("pool_filename"), col("pdf_name").as("pool_pdf"))
    val sameCnt = same.groupBy(col("row_key").as("cnt_key")).agg(count(lit(1)).as("n_same"))
    val short = rows
      .join(sameCnt, rows("row_key") === sameCnt("cnt_key"), "left")
      .withColumn("n_same", coalesce(col("n_same"), lit(0L)))
      .filter(col("n_same") < negPosRatio)
    val extra = short
      .join(broadcast(pool), col("pool_pdf") =!= col("source_file"))
      .withColumn("sk", sampleKey(col("row_key"), col("pool_filename")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("row_key")).orderBy(col("sk").asc, col("pool_filename").asc)))
      .filter(col("rn") <= lit(negPosRatio) - col("n_same"))
      .select(col("row_key"), col("company"), col("year"), col("question"),
        col("pool_filename").as("table_filename"))

    same.unionByName(extra)
      .withColumn("answer", lit(null).cast("string"))
      .withColumn("label", lit(0))
  }

  /** Full chain: positives + negatives with the reference's output
    * columns (Company, Year, Question, Answer, Table_filename, Label —
    * table_curator.py:77-85).
    */
  def dataset(ann: DataFrame, tables: DataFrame, score: (Column, Column) => Column,
              negPosRatio: Int, poolSize: Int): DataFrame = {
    val meta = tableMeta(tables)
    // one materialized stage for the fuzzy-scored positives: the final
    // positive rows AND negExamples' first-positive lookup both consume
    // them. r19: the repartition alone never materialized — each
    // consumer still re-ran the token_set_ratio scoring join under its
    // own copy of the exchange; Scale.shared makes the comment true.
    val pos = Scale.shared(posExamples(ann, meta, score).repartition(col("row_key")))
    val annDim = ann.select(col("row_key").as("ann_key"), col("source_file"))
    val neg = negExamples(
      pos.join(annDim, pos("row_key") === annDim("ann_key")).drop("ann_key"),
      meta, negPosRatio, poolSize)
    val cols = Seq("company", "year", "question", "answer", "table_filename", "label")
    pos.select(cols.map(col): _*).unionByName(neg.select(cols.map(col): _*))
  }
}
