package graft.sources

import graft.functions.TextFns

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1: PDF → per-page paragraph scan (SURVEY §2.1; reference:
  * src/components/preprocessing/pdf_text_extractor.py:54-117).
  *
  * Spark-side plumbing is real: `binaryFile` source → partition-batched
  * extraction (one extractor init per task) → long table
  * `(pdf_name, page, para_idx, paragraph)` → paragraph-length filter.
  * The PDF codec is pluggable behind [[PdfTextExtractor]]:
  * [[SimplePdfExtractor]] is a JDK-only real implementation covering
  * the simple-PDF subset (raw/FlateDecode content streams, standard
  * text operators — see its scaladoc for the documented limits);
  * swap in a pdfbox-backed extractor for full coverage where that
  * dependency is available. `FakePdfExtractor` remains as the
  * deterministic plumbing-test stand-in.
  */
object PdfSource {

  /** page → raw page text, in page order. */
  trait PdfTextExtractor extends Serializable {
    def extractPages(fileName: String, bytes: Array[Byte]): Seq[String]
  }

  /** Deterministic stub: "pages" derived from the payload bytes.
    * A real implementation swaps this body for pdfbox's
    * PDFTextStripper; the Spark plumbing is unchanged.
    */
  final class FakePdfExtractor(pagesPerDoc: Int = 3) extends PdfTextExtractor {
    def extractPages(fileName: String, bytes: Array[Byte]): Seq[String] = {
      val n = if (bytes == null) 0 else bytes.length
      (0 until pagesPerDoc).map { p =>
        s"page $p of $fileName with $n bytes\n\nsecond paragraph of page $p"
      }
    }
  }

  private val outSchema = StructType(Seq(
    StructField("pdf_name", StringType),
    StructField("page", IntegerType),
    StructField("para_idx", IntegerType),
    StructField("paragraph", StringType)
  ))

  /** Read a directory of PDFs into the engine's long paragraph table.
    * Paragraphs split on blank lines; paragraphs with fewer than
    * `minParagraphLength` alphabetic chars are dropped
    * (pdf_text_extractor.py:54-78 semantics).
    */
  def readPdfParagraphs(
      spark: SparkSession,
      dir: String,
      extractor: PdfTextExtractor,
      minParagraphLength: Int = 10,
      glob: String = "*.pdf"
  ): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
    val pathIdx    = 0
    val contentIdx = 1
    val exploded = bin.mapPartitions { rows =>
      // one extractor per task — the codec-init amortization point
      rows.flatMap { r =>
        val path = r.getString(pathIdx)
        val name = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".pdf")
        extractor.extractPages(name, r.getAs[Array[Byte]](contentIdx)).zipWithIndex.flatMap {
          case (pageText, pageNo) =>
            pageText.split("\n\n").zipWithIndex.map { case (para, i) =>
              Row(name, pageNo, i, para)
            }
        }
      }
    }(Encoders.row(outSchema))
    // reference order (pdf_text_extractor.py:54-78): clean each
    // paragraph FIRST, then count alphabetic chars (unicode letters,
    // matching Python isalpha) on the cleaned text
    exploded
      .withColumn("paragraph", TextFns.cleanText(col("paragraph")))
      .filter(length(regexp_replace(col("paragraph"), "[^\\p{L}]", "")) > minParagraphLength)
  }

  /** Write the long paragraph table back out as per-PDF extraction
    * JSON records `{"pdf_name": ..., "pages": {page -> [paragraphs]}}`
    * — the reference's stage hand-off artifact
    * (pdf_text_extractor.py:146-148), with the pdf name embedded
    * (Spark does not control output file names). collect orders are
    * made total via array_sort.
    */
  def writeExtractionJson(paragraphs: DataFrame, outDir: String): Unit = {
    val nested = paragraphs
      .groupBy(col("pdf_name"), col("page"))
      .agg(array_sort(collect_list(struct(col("para_idx"), col("paragraph")))).as("ps"))
      .select(col("pdf_name"), col("page"),
        transform(col("ps"), p => p.getField("paragraph")).as("paras"))
      .groupBy(col("pdf_name"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("page").cast("string"), col("paras"))))).as("pages"))
    nested.write.mode("overwrite").json(outDir)
  }

  /** Read extraction-JSON records written by [[writeExtractionJson]]
    * back to the long form (pdf_name embedded in the record).
    */
  def readExtractionRecords(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("pdf_name", StringType),
        StructField("pages", MapType(StringType, ArrayType(StringType))))))
      .json(path)
      .select(col("pdf_name"), explode(col("pages")).as(Seq("page_str", "paragraphs")))
      .withColumn("page", col("page_str").cast("int"))
      .select(col("pdf_name"), col("page"), posexplode(col("paragraphs")).as(Seq("para_idx", "paragraph")))
}
