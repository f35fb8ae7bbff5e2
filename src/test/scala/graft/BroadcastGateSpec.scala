package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Hints}

/** The size-gated-broadcast policy (r14 verdict, What's wrong #2):
  * [[graft.ops.Hints.broadcastIfSmall]] keeps a probe's forced
  * broadcast hint only under a byte cap and otherwise lets AQE choose
  * the join strategy. The hint is a pure physical-planning device, so
  * BOTH sides of the gate must produce byte-identical rows — pinned
  * here by running the canon probe with the cap at +∞ (every hint
  * engaged: the small-increment fast path) and at 0 (no hint
  * anywhere: the month-scale-crawl degradation path) and comparing
  * the full sorted outputs.
  */
class BroadcastGateSpec extends SparkSpecBase {

  test("canonDedupWithIndex: hinted and unhinted paths emit identical rows") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ref = d.filter(pmod(col("doc_id"), lit(3)) === 0)
    val inc = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      // plant exact-canon dups of some ref docs so keep_id actually
      // resolves against the index, not just within the increment
      .unionByName(ref.limit(20).select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    val p = java.io.File.createTempFile("graft-bcgate", "")
    p.delete()
    Dedup.writeCanonIndex(ref, "doc_id", "text", p.getAbsolutePath)

    def run(maxBytes: Long) =
      Dedup.canonDedupWithIndex(spark, p.getAbsolutePath, inc, "doc_id", "text", maxBytes)
        .orderBy(col("doc_id")).collect().toSeq

    val hinted   = run(Long.MaxValue)
    val unhinted = run(0L)
    assert(hinted.nonEmpty)
    assert(hinted.exists(r => r.getLong(2) == 0L),
      "plant failed: no increment doc resolved to an indexed winner")
    assert(hinted == unhinted,
      "size-gated broadcast changed probe OUTPUT — the hint must be planning-only")
  }

  test("broadcastIfSmall gates on the optimized-plan estimate") {
    val df = spark.range(1000).toDF("id")
    // cap 0: never hinted — the returned plan must be the input plan
    assert(Hints.broadcastIfSmall(df, 0L).queryExecution.logical ==
      df.queryExecution.logical)
    // huge cap: hinted — logical plan gains the ResolvedHint node
    assert(Hints.broadcastIfSmall(df, Long.MaxValue).queryExecution.logical !=
      df.queryExecution.logical)
  }
}
