package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources/sinks for the reference's semi-structured interchange
  * formats (SURVEY §2.1 S3/S6/S7).
  */
object ExtractionJson {

  /** Per-PDF extraction JSON `{ "page": ["para", ...] }`
    * (pdf_text_extractor.py:103-117) normalized to the engine's long
    * form `(pdf_name, page, para_idx, paragraph)`. One file per PDF;
    * pdf_name derives from the file name. Explicit MapType schema —
    * schema inference over a 100 TB corpus of one-off JSON shapes is a
    * full extra pass.
    */
  def readExtraction(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("pages", MapType(StringType, ArrayType(StringType)), nullable = true)
    ))
    spark.read
      .schema(schema)
      .option("multiLine", "true")
      .json(path)
      .withColumn("pdf_name",
        // input_file_name() is URI-encoded; '+' protected before
        // url_decode (which would read it as a form-encoded space)
        url_decode(regexp_replace(
          regexp_replace(element_at(split(input_file_name(), "/"), -1), "\\.json$", ""),
          "\\+", "%2B")))
      .select(col("pdf_name"), explode(col("pages")).as(Seq("page_str", "paragraphs")))
      .withColumn("page", col("page_str").cast("int"))
      .select(col("pdf_name"), col("page"), posexplode(col("paragraphs")).as(Seq("para_idx", "paragraph")))
      .select("pdf_name", "page", "para_idx", "paragraph")
  }

  /** The reference JSON has the map at the document root, not under a
    * field; wrap raw text via from_json when reading such files.
    */
  def readExtractionRootMap(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(path)
      .withColumn("pdf_name",
        // input_file_name() is URI-encoded; '+' protected before
        // url_decode (which would read it as a form-encoded space)
        url_decode(regexp_replace(
          regexp_replace(element_at(split(input_file_name(), "/"), -1), "\\.json$", ""),
          "\\+", "%2B")))
      .withColumn("pages", from_json(col("value"), MapType(StringType, ArrayType(StringType))))
      .select(col("pdf_name"), explode(col("pages")).as(Seq("page_str", "paragraphs")))
      .withColumn("page", col("page_str").cast("int"))
      .select(col("pdf_name"), col("page"), posexplode(col("paragraphs")).as(Seq("para_idx", "paragraph")))
      .select("pdf_name", "page", "para_idx", "paragraph")

  /** SQuAD v2 reader: nested JSON → flat (title, context, question,
    * id, is_impossible, answer, answer_start) rows.
    */
  def readSquad(spark: SparkSession, path: String): DataFrame = {
    val answers = ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("answer_start", IntegerType)
    )))
    val schema = StructType(Seq(
      StructField("version", StringType),
      StructField("data", ArrayType(StructType(Seq(
        StructField("title", StringType),
        StructField("paragraphs", ArrayType(StructType(Seq(
          StructField("context", StringType),
          StructField("qas", ArrayType(StructType(Seq(
            StructField("question", StringType),
            StructField("id", LongType),
            StructField("is_impossible", BooleanType),
            StructField("answers", answers)
          ))))
        ))))
      ))))
    ))
    spark.read.schema(schema).option("multiLine", "true").json(path)
      .select(explode(col("data")).as("d"))
      .select(col("d.title").as("title"), explode(col("d.paragraphs")).as("p"))
      .select(col("title"), col("p.context").as("context"), explode(col("p.qas")).as("qa"))
      .select(
        col("title"),
        col("context"),
        col("qa.question").as("question"),
        col("qa.id").as("id"),
        col("qa.is_impossible").as("is_impossible"),
        explode_outer(col("qa.answers")).as("a")
      )
      .select(col("title"), col("context"), col("question"), col("id"), col("is_impossible"),
        col("a.text").as("answer"), col("a.answer_start").as("answer_start"))
  }
}
