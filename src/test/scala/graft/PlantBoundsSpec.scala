package graft

import org.apache.spark.sql.functions._

/** Tripwire for the fixed-offset plants (r14 ADVICE): `plantedDocs`
  * re-appends doc_id < 25 at id+10000 and `plantedEmb` re-appends
  * vec_id < 20 at id+100000 — fixed constants that silently collide
  * with real ids if the generator ever assigns ids in those windows
  * (bench-scale corpora place copied blocks at i·1,000,000, whose
  * 5000-wide blocks miss both windows today — this spec is what
  * makes "today" checked instead of assumed). The canon plant needs
  * no tripwire since r15: its offset DERIVES from max(doc_id)+1.
  *
  * Checked over every data dir present (driver testdata at all three
  * scale factors + the builder's sf1 benchdata), with parquet filter
  * pushdown so each check is a row-group-pruned point read.
  */
class PlantBoundsSpec extends SparkSpecBase {

  private val dirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
    "benchdata/sf1").filter(d => new java.io.File(d).isDirectory)

  test("no real doc_id falls inside the neardup plant window [10000, 10025)") {
    dirs.foreach { d =>
      val n = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") >= 10000L && col("doc_id") < 10025L).count()
      assert(n == 0, s"$d: $n real docs inside the +10000 plant window — " +
        "planted near-dup ids would collide with real ids; move the offset")
    }
  }

  test("no real vec_id falls inside the embedding plant window [100000, 100020)") {
    dirs.foreach { d =>
      val n = spark.read.parquet(s"$d/embeddings.parquet")
        .filter(col("vec_id") >= 100000L && col("vec_id") < 100020L).count()
      assert(n == 0, s"$d: $n real vectors inside the +100000 plant window")
    }
  }

  test("simhash agree-slice bound (doc_id < 600) covers the whole gate-scale corpus") {
    // x_dedup_simhash_agree/_fast truth runs on the id<600 slice with
    // the documented claim that the bound is VACUOUS at the sf0.01
    // oracle gate — make the claim checked, not narrative
    val mx = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .agg(max(col("doc_id"))).head.getLong(0)
    assert(mx < 600L,
      s"sf0.01 max doc_id is $mx ≥ 600 — the simhash agree slice is no longer " +
        "vacuous at the gate scale and its oracle claim must be restated")
  }
}
