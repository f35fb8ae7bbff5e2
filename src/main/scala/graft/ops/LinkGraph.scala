package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analysis over a host→host edge list — the corpus-
  * curation use: domain authority as a quality prior when weighting
  * web-crawl sources (a standard ingredient next to the per-document
  * quality heuristics in [[CorpusOps]]; CommonCrawl curations rank
  * hosts by centrality for exactly this).
  *
  * PageRank runs in FIXED-POINT INTEGER arithmetic: ranks are
  * integers at scale 10^12, the damping step is `(85·r) div
  * (100·outdeg)`, and the teleport base is `(15·scale) div (100·N)`.
  * Floating-point PageRank is not cross-engine checkable (the
  * incoming-contribution sum's ORDER is nondeterministic across
  * partitions, and float addition doesn't commute in rounding);
  * integer sums commute exactly, and truncating division matches
  * DuckDB's `//` on non-negatives — so K unrolled iterations replay
  * hash-exact in the SQL oracle. Dangling nodes (no out-links) leak
  * their damped mass by design — the simplification is documented
  * rather than redistributing, keeping each iteration a single
  * edges⋈ranks join.
  *
  * Scale shape: per iteration, one equi-join of the edge list with
  * the node-sized rank frame on `src` (ranks broadcast when small,
  * shuffle-on-src otherwise) and one map-side-combinable sum by
  * `dst`. The rank frame is NODE-sized, never corpus-sized; lineage
  * is truncated per round with localCheckpoint (the CC / Lloyd
  * pattern). The only driver materialization is the node COUNT — one
  * scalar.
  */
object LinkGraph {

  /** Fixed-point PageRank over `(src, dst)` string edges. Returns
    * one row per node: `host`, integer `rank` (scale 10^12), and
    * `n_in` (distinct in-links). Self-loops and duplicate edges are
    * dropped; `iters` is the unrolled iteration count.
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val outd = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // node count only — a bounded driver scalar
    require(n > 0, "pageRank needs a non-empty edge list")
    val base = (15L * scale) / (100L * n)

    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("host"))
        .join(outd, "src")
        .select(col("dst"), expr("(85 * rank) div (100 * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      ranks = nodes
        .join(contribs, nodes("host") === contribs("dst"), "left")
        .select(col("host"), (lit(base) + coalesce(col("c"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("n_in"))
    ranks
      .join(indeg, ranks("host") === indeg("dst"), "left")
      .select(col("host"), col("rank"), coalesce(col("n_in"), lit(0L)).as("n_in"))
  }
}
