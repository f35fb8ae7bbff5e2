package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The gate-startup layout contract (GraftSession.layoutReport): one
  * fingerprint line per table, both supported events.ts layouts
  * normalize, and an unhandled drift raises ONE named LAYOUT_DRIFT
  * error — the round-7 lesson, when a silent testdata regeneration
  * surfaced as four scattered analysis failures.
  */
class LayoutContractSpec extends SparkSpecBase {
  import spark.implicits._

  test("layoutReport fingerprints every table and tags both supported ts layouts") {
    val lines = GraftSession.layoutReport(spark, sf)
    assert(lines.nonEmpty && lines.forall(_.matches("\\[layout\\] \\S+ fingerprint=[0-9a-f]{12}.*")))
    val ev = lines.find(_.startsWith("[layout] events ")).get
    assert(ev.contains("ts=bigint(nanos)") || ev.contains("[normalized]"),
      s"events line must name the ts layout: $ev")
  }

  test("fingerprints are schema-sensitive: same schema stable, different schema differs") {
    val dir = Files.createTempDirectory("layout-spec").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/t1.parquet")
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$dir/t2.parquet")
    Seq((1L, 1.5)).toDF("k", "x").write.parquet(s"$dir/t3.parquet")
    def fp(line: String) = line.split("fingerprint=")(1).take(12)
    val byName = GraftSession.layoutReport(spark, dir)
      .map(l => l.split(" ")(1) -> fp(l)).toMap
    assert(byName("t1") === byName("t2"), "identical schemas must fingerprint identically")
    assert(byName("t1") !== byName("t3"), "different schemas must fingerprint differently")
  }

  test("an unhandled ts type fails fast with ONE named LAYOUT_DRIFT error") {
    val dir = Files.createTempDirectory("layout-drift").toString
    Seq((1L, "not-a-time")).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      GraftSession.layoutReport(spark, dir)
    }
    assert(e.getMessage.startsWith("LAYOUT_DRIFT"), e.getMessage)
    assert(e.getMessage.contains("events.ts"), e.getMessage)
  }
}
