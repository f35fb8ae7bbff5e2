package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Spark 4's built-in XML source on the disclosure shapes that matter:
  * attribute columns, nested elements, and the write→read round-trip
  * the `s12_xml_roundtrip` gate row drives.
  */
class XmlSourceSpec extends SparkSpecBase {

  test("XBRL-shaped facts parse: attributes via _ prefix, nested context elements") {
    // a minimal XBRL-instance-like document: facts carry contextRef /
    // unitRef ATTRIBUTES and a text value; contexts are separate
    // nested rows
    val doc =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xbrl>
        |  <fact contextRef="FY2023" unitRef="EUR" name="Revenues">1250000</fact>
        |  <fact contextRef="FY2022" unitRef="EUR" name="Revenues">1100000</fact>
        |  <fact contextRef="FY2023" unitRef="tCO2e" name="Scope1Emissions">8421</fact>
        |</xbrl>""".stripMargin
    val dir = Files.createTempDirectory("xbrl").toString
    Files.write(java.nio.file.Paths.get(dir, "facts.xml"), doc.getBytes(UTF_8))
    val facts = spark.read.format("xml").option("rowTag", "fact").load(dir)
      .select(col("_name").as("name"), col("_contextRef").as("ctx"),
        col("_unitRef").as("unit"), col("_VALUE").cast("long").as("value"))
      .orderBy(col("name"), col("ctx"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(facts.toSeq === Seq(
      ("Revenues", "FY2022", "EUR", 1100000L),
      ("Revenues", "FY2023", "EUR", 1250000L),
      ("Scope1Emissions", "FY2023", "tCO2e", 8421L)))
  }

  test("write -> read round-trip preserves rows and inferred types") {
    import spark.implicits._
    val src = Seq((1L, "alpha", 3.5), (2L, "beta", -0.25)).toDF("id", "name", "score")
    val dir = Files.createTempDirectory("xmlrt").toString + "/out"
    src.coalesce(1).write.format("xml")
      .option("rootTag", "rows").option("rowTag", "row").save(dir)
    val back = spark.read.format("xml").option("rowTag", "row").load(dir)
      .select(col("id").cast("long"), col("name"), col("score").cast("double"))
      .orderBy(col("id"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "alpha", 3.5), (2L, "beta", -0.25)))
  }
}
