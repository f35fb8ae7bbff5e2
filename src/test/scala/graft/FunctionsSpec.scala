package graft

import graft.functions.{AnswerStart, DetHash, Fuzzy, ListParse, TextFns}
import graft.scorer.MockScores

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzySpec extends AnyFunSuite {
  test("indel distance: substitution costs 2") {
    assert(Fuzzy.indelDistance("abc", "abc") === 0)
    assert(Fuzzy.indelDistance("abc", "abd") === 2) // sub = del+ins
    assert(Fuzzy.indelDistance("abc", "ab") === 1)
    assert(Fuzzy.indelDistance("", "xyz") === 3)
  }
  test("ratio matches fuzzywuzzy flavor") {
    assert(Fuzzy.ratio("abc", "abc") === 100)
    assert(Fuzzy.ratio("", "") === 100)
    // ratio = 100 * (la+lb-dist)/(la+lb) = 100*(6-2)/6 = 66.67 → 67
    assert(Fuzzy.ratio("abc", "abd") === 67)
  }
  test("partial_ratio: best window of the longer string") {
    assert(Fuzzy.partialRatio("abc", "xxabcxx") === 100)
    assert(Fuzzy.partialRatio("abc", "") === 0)
    assert(Fuzzy.partialRatio("", "") === 100)
  }
  test("token_set_ratio ignores order and duplication") {
    assert(Fuzzy.tokenSetRatio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") === 100)
    assert(Fuzzy.tokenSetRatio("a b common", "common a b extra tokens") === 100) // subset → t0 vs t1 prefix
    assert(Fuzzy.tokenSetRatio("alpha beta", "gamma delta") < 40)
  }
  test("token_set_ratio applies fuzzywuzzy full_process (punctuation stripped)") {
    assert(Fuzzy.tokenSetRatio("Total CO2:", "total co2") === 100)
    assert(Fuzzy.fullProcess("A-b.c!") === "a b c")
  }
  test("ratio rounds half-even like Python round()") {
    // lensum 16, indel dist 14 → 12.5 → 12 (banker's), not 13
    assert(Fuzzy.ratio("abbbbbbb", "accccccc") === 12)
  }
}

class TokenSetRatioExprSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expression matches the Scala function and handles nulls") {
    val df = Seq(
      ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear"),
      ("alpha beta", "gamma delta"),
      (null, "x")
    ).toDF("a", "b")
    val out = df.selectExpr("token_set_ratio(a, b) AS r").collect()
    assert(out(0).getInt(0) === 100)
    assert(out(1).getInt(0) === graft.functions.Fuzzy.tokenSetRatio("alpha beta", "gamma delta"))
    assert(out(2).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    // local one-row relations collapse to LocalTableScan; use a range
    // source so a codegen stage actually materializes
    val df = spark.range(4).selectExpr(
      "token_set_ratio(concat('tok ', id), concat(id, ' tok')) AS r")
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [token_set_ratio"))
    assert(df.collect().map(_.getInt(0)).forall(_ > 0))
  }
}

class NfcNormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("nfc_normalize composes decomposed sequences and is idempotent") {
    val df = Seq(
      ("e\u0301", "\u00e9"),             // combining acute -> precomposed
      ("\u00e9", "\u00e9"),              // already NFC: identity
      ("ascii only", "ascii only"),      // fast path
      ("\u1100\u1161", "\uAC00"),       // Hangul jamo -> syllable GA
      ("q\u0301", "q\u0301"),            // no precomposed q-acute exists: preserved
      (null, null)
    ).toDF("raw", "want")
    val out = df.selectExpr("nfc_normalize(raw) AS got", "want").collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), "null must propagate")
      else assert(r.getString(0) === r.getString(1))
    }
    // idempotence: nfc(nfc(x)) = nfc(x)
    val twice = df.filter(col("raw").isNotNull)
      .selectExpr("nfc_normalize(nfc_normalize(raw)) AS a", "nfc_normalize(raw) AS b")
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("nfc_normalize participates in whole-stage codegen") {
    val df = spark.range(4).selectExpr(
      "nfc_normalize(concat('x', id, 'e\u0301')) AS s")
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [nfc_normalize"))
    assert(df.collect().map(_.getString(0)).forall(_.endsWith("\u00e9")))
  }

  test("nfc_normalize collapses the dedup-evasion variants the x_text_nfc gate plants") {
    // composed vs zero-width + decomposed: raw-unequal, canon-equal
    val zw = "[\u200B\u200C\u200D\uFEFF]"
    val df = Seq(("doc body", "doc body")).toDF("t1", "t2")
      .select(concat(col("t1"), lit("\u00e9")).as("a"),
        concat(col("t2"), lit("\u200Be\u0301")).as("b"))
    val r = df
      .select(col("a"), regexp_replace(col("b"), zw, "").as("sb"))
      .select(
        (col("a") === col("sb")).as("raw_eq"),
        (expr("nfc_normalize(a)") === expr("nfc_normalize(sb)")).as("canon_eq")).head()
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }
}

class AnswerStartSpec extends AnyFunSuite {
  test("plain substring: all occurrences, sorted") {
    assert(AnswerStart.findAnswerStart("ab", "ab cab ab") === Seq(0, 4, 7))
    assert(AnswerStart.findAnswerStart("zz", "ab") === Seq.empty)
    assert(AnswerStart.findAnswerStart("", "ab") === Seq.empty)
  }
  test("dot is escaped as a literal") {
    assert(AnswerStart.findAnswerStart("1.5", "a 1.5 and 1x5") === Seq(2))
  }
  test("numeric answers need non-digit boundaries") {
    // "16" inside "2016": the prefix pattern rejects it, but the
    // reference's suffix pattern ("16[^0-9]") still admits index 5 —
    // faithful union semantics (base_kpi_inference_curator.py:129-156)
    assert(AnswerStart.findAnswerStart("16", "in 2016 total 16 x") === Seq(5, 14))
    // string-start numeric is not matched (reference semantics: the
    // [^0-9]-prefixed pattern needs a preceding char)
    assert(AnswerStart.findAnswerStart("16", "16 items") === Seq(0)) // suffix pattern "16[^0-9]" matches at 0
    assert(AnswerStart.findAnswerStart("16", "x16") === Seq(1))
  }
}

class TextFnsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(in).toDF("s").select(f(col("s")).as("r")).collect().head.getString(0)

  test("cleanText: quotes, whitespace, control chars") {
    assert(one("a“q”b", TextFns.cleanText) === "aqb")
    assert(one("a\nb\tc", TextFns.cleanText) === "a b c")
    assert(one("a  b   c", TextFns.cleanText) === "a b c")
    assert(one("xyÿz", TextFns.cleanText) === "xyz")
    // bracket-context quotes become double-quotes
    assert(one("[“q”]", TextFns.cleanText) === "[\"q\"]")
  }
  test("cleanTextKpi: specials stripped, lowercased, multi-dots dropped") {
    assert(one("A (B) [C] D..E...", TextFns.cleanTextKpi) === "a b c de")
    assert(one("X+Y|Z{Q}$5?", TextFns.cleanTextKpi) === "xyzq5")
  }
  test("snakify") {
    assert(TextFns.snakify("Average Emission (tCO2e)") === "avg_emission_tco2e")
    assert(TextFns.snakify("A-B  C.D") === "a_b_cd")
  }
  test("fixPdfName") {
    val rows = Seq("a,pdf", "b", "c.pdf").toDF("s")
      .select(TextFns.fixPdfName(col("s"))).collect().map(_.getString(0))
    assert(rows === Array("a.pdf", "b.pdf", "c.pdf"))
  }
  test("templateQuestion splices year before the question mark") {
    val r = Seq(("what is x?", 2019, true), ("what is x?", 2019, false)).toDF("q", "y", "a")
      .select(TextFns.templateQuestion(col("q"), col("y"), col("a"))).collect().map(_.getString(0))
    assert(r === Array("what is x in year 2019?", "what is x?"))
  }
}

class ListParseSpec extends SparkSpecBase {
  import spark.implicits._

  test("parseSourcePages handles int lists and rejects junk") {
    val out = Seq("[1, 2]", "[03]", "nope", "[]").toDF("s")
      .select(ListParse.parseSourcePages(col("s")).as("p")).collect()
    assert(out(0).getSeq[Int](0) === Seq(1, 2))
    assert(out(1).getSeq[Int](0) === Seq(3))
    assert(out(2).isNullAt(0))
  }
  test("parseParagraphList repairs bracket typos and splits both delimiters") {
    val out = Seq(
      """["a", "b"]""",
      """{"a", "b"]""", // head typo
      """["a","b"[""",  // tail typo
      "garbage"
    ).toDF("s").select(ListParse.parseParagraphList(col("s")).as("p")).collect()
    assert(out(0).getSeq[String](0) === Seq("a", "b"))
    assert(out(1).getSeq[String](0) === Seq("a", "b"))
    assert(out(2).getSeq[String](0) === Seq("a", "b"))
    assert(out(3).isNullAt(0))
  }
}

class DetHashSpec extends SparkSpecBase {
  import spark.implicits._
  test("detUnit is deterministic, in [0,1), and stable under repartition") {
    val df  = (0L until 1000L).toDF("k")
    val u1  = df.select(DetHash.detUnit(col("k")).as("u")).collect().map(_.getDouble(0))
    val u2  = df.repartition(7).select(DetHash.detUnit(col("k")).as("u"))
      .collect().map(_.getDouble(0)).sorted
    assert(u1.forall(u => u >= 0.0 && u < 1.0))
    assert(u1.sorted === u2)
    // roughly uniform: mean within 5% of 0.5
    assert(math.abs(u1.sum / u1.length - 0.5) < 0.05)
  }
  test("scala-side MockScores.unit matches the column expression") {
    val df = (0L until 100L).toDF("k")
    val colVals = df.select(DetHash.detUnit(col("k"))).collect().map(_.getDouble(0))
    val scalaVals = (0L until 100L).map(MockScores.unit)
    assert(colVals.toSeq === scalaVals)
  }
}

class DotF32Spec extends SparkSpecBase {
  import spark.implicits._

  test("dot_f32 matches the HOF formulation bit-for-bit and handles nulls/empties") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-7.5f, 0.25f, 12.125f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      graft.ops.Similarity.dot(col("a"), col("b")).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows(2).getDouble(0) === 0.0)
    // null input → null out (nullSafeEval contract)
    val n = Seq((null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("a", "b")
      .select(graft.ops.Similarity.dot(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("dot_f32 powers cosine on the embeddings table identically to the HOF path") {
    val e = GraftSession.table(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    val hofDot = aggregate(
      zip_with(col("a.embedding"), col("b.embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val out = pairs.select(
      graft.ops.Similarity.dot(col("a.embedding"), col("b.embedding")).as("fast"),
      hofDot.as("ref")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}

class MinhashSigsSpec extends SparkSpecBase {
  import spark.implicits._

  test("minhash_sigs is bit-identical to the per-seed array_min(transform(xxhash64)) formulation") {
    val df = Seq(
      Tuple1(Array(3L, 99L, -5L, 123456789L)),
      Tuple1(Array(42L)),
      Tuple1(Array(Long.MaxValue, Long.MinValue, 0L))
    ).toDF("hs")
    val k = 16
    val ref = array((0 until k).map { i =>
      array_min(transform(col("hs"), h => xxhash64(lit(i), h)))
    }: _*)
    val rows = df.select(
      graft.ops.Dedup.minhashSignatureFast(col("hs"), k).as("fast"), ref.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }
}

class Simhash64Spec extends SparkSpecBase {
  import spark.implicits._

  test("simhash64 is bit-identical to the 64 per-bit aggregate folds") {
    val df = Seq(
      Tuple1(Array(3L, 99L, -5L, 123456789L, 3L)),
      Tuple1(Array(42L)),
      Tuple1(Array(Long.MaxValue, Long.MinValue, 0L, -1L))
    ).toDF("hs")
    val ref = (0 until 64).map { bit =>
      val votes = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val rows = df.select(
      graft.ops.Dedup.simhashOfHashes(col("hs")).as("fast"), ref.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }
}

class Simhash32Md5Spec extends SparkSpecBase {
  import spark.implicits._

  test("simhash32_md5 is bit-identical to the per-bit conv(substring) folds") {
    val df = Seq(
      Tuple1(Seq("words", "more", "words", "here")),
      Tuple1(Seq("single")),
      Tuple1(Seq("a", "b", "c", "d", "e", "f"))
    ).toDF("toks").select(transform(col("toks"), t => md5(t)).as("hs"))
    val ref = (0 until 32).map { b =>
      val votes = aggregate(col("hs"), lit(0), (acc, h) => {
        val n  = conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int")
        val bt = shiftright(n, b % 4).bitwiseAND(lit(1))
        acc + (bt * 2 - 1)
      })
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
    val rows = df.select(
      graft.ops.Dedup.simhash32OfMd5(col("hs")).as("fast"), ref.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }
}
