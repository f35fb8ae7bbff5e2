package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

/** Laws of the INGEST-GATE capstone (r15): the composed admission
  * chain (canon dedup → span cut → Gopher gate → decontamination →
  * curriculum layout).
  *
  * DEPLOYED ≡ ONE-SHOT union law: running an increment through
  * persisted state fit on the reference corpus admits EXACTLY the
  * docs (with exactly the cleaned token counts) that one batch over
  * reference ∪ increment admits, restricted to increment docs — for
  * stages 1-4. Stage 5 (curriculum) intentionally differs from the
  * one-shot: cutpoints FREEZE at manifest build and positions land
  * after the committed tail (arrival-time independence is the
  * contract there, gated by its own append-algebra oracle).
  *
  * Precondition (stated, not hidden): no canonical content may appear
  * in BOTH slices under different ids with the increment's id
  * smaller — then the union one-shot would retro-kill a reference doc
  * whose spans the deployed index has already committed. The spec
  * corpus plants canon dups only as increment twins of reference
  * docs (the ingest case), where the law is exact.
  */
class IngestCapstoneSpec extends SparkSpecBase {

  private def corpus: DataFrame = {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val banner =
      "accept all cookies to continue. this site uses tracking. see our privacy policy."
    d.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(banner + " "), col("text"))).otherwise(col("text")).as("text"))
  }

  private def bench(raw: DataFrame): DataFrame =
    raw.filter(col("doc_id") < 10)
      .select(col("doc_id").as("bench_id"),
        graft.functions.TextFns.tokenSlice(col("text"), 5, 15).as("btext"))

  test("deployed chain ≡ one-shot on the union, restricted to the increment (stages 1-4)") {
    val base = corpus.localCheckpoint()
    val off  = base.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val ref  = base.filter(pmod(col("doc_id"), lit(3)) === 0)
    // increment: fresh docs + evasive canon twins of INDEXED docs
    val inc = base.filter(pmod(col("doc_id"), lit(9)) === 4)
      .unionByName(ref.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + lit(off)).as("doc_id"),
          concat(upper(col("text")), lit("\u200B")).as("text")))
    val b = bench(spark.read.parquet(s"$sf/documents.parquet"))

    val statePath = {
      val f = java.io.File.createTempFile("graft-ingest-law", "")
      f.delete(); f.getAbsolutePath
    }
    CorpusOps.writeIngestGateState(ref, "doc_id", "text", b, "bench_id", "btext", statePath)

    val deployed = CorpusOps
      .ingestGateWithState(spark, statePath, inc, "doc_id", "text", "law")
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id")).collect().toSeq
    val oneShot = CorpusOps
      .ingestGate(ref.unionByName(inc), "doc_id", "text", b, "bench_id", "btext")
      .join(inc.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id")).collect().toSeq

    assert(deployed.nonEmpty, "law vacuous: deployed chain admitted nothing")
    assert(deployed == oneShot,
      s"deployed ≠ one-shot union on increment: ${deployed.size} vs ${oneShot.size} docs")
    // every planted twin must have died at the canon stage
    val admitted = deployed.map(_.getLong(0)).toSet
    assert(!admitted.exists(_ >= off), "an evasive canon twin survived the deployed gate")
  }

  test("deployed chain is replay-idempotent (same incrementId, same output)") {
    val base = corpus.limit(200).localCheckpoint()
    val ref  = base.filter(pmod(col("doc_id"), lit(3)) === 0)
    val inc  = base.filter(pmod(col("doc_id"), lit(9)) === 4)
    val b    = bench(spark.read.parquet(s"$sf/documents.parquet"))
    val statePath = {
      val f = java.io.File.createTempFile("graft-ingest-replay", "")
      f.delete(); f.getAbsolutePath
    }
    CorpusOps.writeIngestGateState(ref, "doc_id", "text", b, "bench_id", "btext", statePath)
    def run() = CorpusOps
      .ingestGateWithState(spark, statePath, inc, "doc_id", "text", "replay")
      .orderBy(col("doc_id")).collect().toSeq
    val first = run()
    assert(first.nonEmpty)
    assert(run() == first, "replaying the same increment id changed the fold output")
  }

  test("capstone plans: neither flavor goes cartesian") {
    val one = SparkEntry.queries("x_ingest_capstone")(spark, sf)
    assert(!one.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "one-shot capstone went cartesian")
    val dep = SparkEntry.queries("x_ingest_capstone_inc")(spark, sf)
    assert(!dep.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "deployed capstone went cartesian")
  }
}
