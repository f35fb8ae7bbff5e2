package graft

import graft.ops.NqCuration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the NQ curation chain
  * (nq_extractor.py:84-140 + nq_curator.py:100-196); the end-to-end
  * oracle check is the c4_nq_curation / c4_nq_table queries.
  */
class NqCurationSpec extends SparkSpecBase {
  import spark.implicits._

  // Two docs: doc 1 has a good long answer, one good negative, one
  // table negative, one short negative, one non-top-level negative,
  // and the candidate at candidate_index that must be excluded.
  // Doc 2 has no long answer (candidate_index -1) → dropped entirely.
  private def nq: DataFrame = Seq(
    (1L,
     "which berry is blue?",
     "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 <Table> t1 t2 </Table> <P> short text </P>",
     0,
     Seq((0L, 12L, true),   // idx 0 == candidate_index → excluded
         (1L, 13L, true),   // plain 12-token negative
         (13L, 17L, true),  // the <Table> block → table side
         (17L, 21L, true),  // short after strip → dropped
         (2L, 13L, false)), // not top_level → excluded
     0L, 12L),
    (2L, "dropped question?", "a b c", -1, Seq((0L, 2L, true)), 0L, 2L)
  ).toDF("example_id", "question_text", "document_text", "candidate_index",
      "cands", "long_answer_start", "long_answer_end")
    .withColumn("candidates", transform(col("cands"),
      c => struct(c.getField("_1").as("start_token"), c.getField("_2").as("end_token"),
        c.getField("_3").as("top_level"))))
    .drop("cands")

  test("relevanceRows: extraction filters + excerpt slicing + table flag") {
    val rows = NqCuration.relevanceRows(nq).orderBy("tie")
      .select("question", "text", "label", "with_table")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.forall(_._1 == "which berry is blue?")) // doc 2 dropped
    assert(rows.length === 4) // pos + 3 kept candidates (idx0 and non-top excluded)
    assert(rows.count(_._3 == 1) === 1)
    val pos = rows.find(_._3 == 1).get
    assert(pos._2 === "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")
    assert(rows.exists(r => r._4 && r._2.contains("<Table>"))) // table candidate flagged
  }

  test("textDataset strips html, drops short rows, keeps only both-label questions") {
    val txt = NqCuration.textDataset(NqCuration.relevanceRows(nq), minTokens = 10)
    val got = txt.select("label").as[Int].collect().sorted
    // the short candidate and table candidate are gone; pos + 1 negative remain
    assert(got === Array(0, 1))
    // both-labels: a frame with positives only collapses to empty
    val posOnly = NqCuration.relevanceRows(nq).filter(col("label") === 1)
    assert(NqCuration.textDataset(posOnly, minTokens = 10).count() === 0)
  }

  test("readNqJsonl + runNqCuration: real JSONL lines through to the balanced CSV products") {
    import java.nio.file.{Files, Paths}
    def line(id: Long, q: String, doc: String, candIdx: Long,
        la: (Long, Long), cands: Seq[(Long, Long, Boolean)]): String = {
      val candJson = cands.map { case (s, e, t) =>
        s"""{"start_token":$s,"end_token":$e,"top_level":$t}""" }.mkString("[", ",", "]")
      s"""{"example_id":$id,"document_text":"$doc","question_text":"$q",""" +
        s""""annotations":[{"yes_no_answer":"NONE","long_answer":{"start_token":${la._1},""" +
        s""""end_token":${la._2},"candidate_index":$candIdx},"short_answers":[]}],""" +
        s""""long_answer_candidates":$candJson}"""
    }
    val body = "tok00 tok01 tok02 tok03 tok04 tok05 tok06 tok07 tok08 tok09 tok10 tok11" // 12 toks
    val tbl  = "<Table> cell one </Table>"
    val doc1 = s"$body other01 other02 other03 other04 other05 other06 other07 other08 other09 other10 other11 other12 $tbl"
    val dir = Files.createTempDirectory("nq-jsonl")
    Files.writeString(Paths.get(dir.toString, "nq.jsonl"), Seq(
      // q1: long answer = first 12 tokens, negatives: a 12-token span and the table span
      line(1, "q one?", doc1, 0L, (0L, 12L),
        Seq((0L, 12L, true), (12L, 24L, true), (24L, 28L, true))),
      // dropped: no long answer
      line(2, "q two?", doc1, -1L, (-1L, -1L), Seq((0L, 12L, true))),
      // q3: same shape so the text dataset keeps two questions
      line(3, "q three?", doc1, 0L, (0L, 12L),
        Seq((0L, 12L, true), (12L, 24L, true)))
    ).mkString("\n"))
    val nq = NqCuration.readNqJsonl(spark, dir.toString)
    assert(nq.count() === 3)
    assert(nq.filter(col("candidate_index") === -1).count() === 1)
    assert(nq.select("short_answer_start").head().getLong(0) === -1L)
    val out = Files.createTempDirectory("nq-out").toString
    val (nText, nTable) = graft.ops.Pipeline.runNqCuration(
      spark, dir.toString, out, extractText = true, extractTables = true,
      negativeFromOtherDocs = false)
    // text: q1 and q3 each keep 1 positive + 1 negative (the table span
    // routes to the table side, where it is a label-0 row per question)
    assert(nText === 4L)
    assert(nTable === 1L)
    val txt = spark.read.option("header", "true").csv(s"$out/NQ_text_relevance_balanced.csv")
    assert(txt.count() === 4)
    assert(txt.filter(col("label") === "1").count() === 2)
    val tblDs = spark.read.option("header", "true").csv(s"$out/NQ_table_relevance_balanced.csv")
    assert(tblDs.select("text").head().getString(0).contains("<Table>"))
  }

  test("balancedDataset picks one DetHash-first negative per question; shuffle reassigns questions") {
    val df = Seq(
      ("qa", "pos a", 1, 100L), ("qa", "neg a1", 0, 101L), ("qa", "neg a2", 0, 102L),
      ("qb", "pos b", 1, 200L), ("qb", "neg b1", 0, 201L)
    ).toDF("question", "text", "label", "tie")
    val plain = NqCuration.balancedDataset(df, negativeFromOtherDocs = false)
      .orderBy("question", "label").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(plain.length === 4) // 2 pos + 1 neg per question
    assert(plain.count(_._3 == 0) === 2)
    // deterministic: rerun identical
    val again = NqCuration.balancedDataset(df, negativeFromOtherDocs = false)
      .orderBy("question", "label").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(plain === again)
    // shuffled flavor: same negative bodies, questions permuted across them
    val shuf = NqCuration.balancedDataset(df, negativeFromOtherDocs = true)
      .filter(col("label") === 0).collect().map(r => (r.getString(0), r.getString(1)))
    assert(shuf.map(_._2).sorted === plain.filter(_._3 == 0).map(_._2).sorted)
    assert(shuf.map(_._1).sorted === Array("qa", "qb"))
  }
}
