package graft

import graft.ops.Pipeline
import graft.scorer.{MockQaScorer, MockRelevanceScorer}

import java.nio.file.Files

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpecBase {

  test("inference pipeline end to end: extraction JSON -> relevance -> KPI -> ORC table -> distribution") {
    val dir = Files.createTempDirectory("pipe").toFile
    val para = "emissions were reduced by a substantial margin across all scopes this year"
    Files.writeString(new java.io.File(dir, "acme.json").toPath,
      s"""{"pages": {"0": ["$para", "another paragraph about production volumes and targets"],
         | "1": ["the company employs several thousand people worldwide"]}}""".stripMargin.replace("\n", ""))
    Files.writeString(new java.io.File(dir, "beta.json").toPath,
      s"""{"pages": {"2": ["$para again with different framing and words"]}}""")
    val questions = spark.createDataFrame(Seq(
      ("what is the annual emission reduction?", 2.1),
      ("how many employees does the company have?", 3.3)
    )).toDF("question", "kpi_id")

    val dist = Pipeline.runInference(spark, dir.getAbsolutePath, questions,
      new MockRelevanceScorer, new MockQaScorer(nBest = 2), "graft_test_results",
      relevanceThreshold = 0.2)
    assert(dist.count() > 0)

    val t = spark.table("graft_test_results")
    assert(t.count() > 0)
    assert(t.columns.toSeq === Seq("pdf_name", "kpi", "kpi_id", "answer", "page",
      "paragraph", "source", "score", "no_ans_score", "no_answer_score_plus_boost"))
    // per-(pdf, question) top-k bound holds through the warehouse round-trip
    assert(t.groupBy("pdf_name", "kpi").count().agg(max("count")).head().getLong(0) <= 4)
  }

  test("skipProcessed: second run sees only unprocessed keys; missing output skips nothing") {
    val out = Files.createTempDirectory("proc").toFile.getAbsolutePath + "/results"
    val all = GraftSession.table(spark, sf, "documents").select(col("doc_id"), col("source"))
    // nothing processed yet → everything passes through
    assert(Pipeline.skipProcessed(all, out, "doc_id").count() === all.count())
    // "process" half of them
    all.filter(col("doc_id") % 2 === 0).write.parquet(out)
    val remaining = Pipeline.skipProcessed(all, out, "doc_id")
    assert(remaining.count() === all.filter(col("doc_id") % 2 =!= 0).count())
    assert(remaining.filter(col("doc_id") % 2 === 0).count() === 0)
  }

  test("parquet external publish: snakified DDL table round-trip (S7)") {
    val src = GraftSession.table(spark, sf, "customer")
      .withColumnRenamed("c_name", "Customer Name (Full)")
    val smoke = Pipeline.publishParquetExternal(spark, src, "/tmp/graft-test-pq", "graft_test_pq")
    assert(smoke.columns.contains("customer_name_full"))
    assert(spark.table("graft_test_pq").count() ===
      GraftSession.table(spark, sf, "customer").count())
  }
}
