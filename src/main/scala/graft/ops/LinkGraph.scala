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
  * their damped mass in the DEFAULT variant — the checkable
  * simplification, each iteration a single edges⋈ranks join.
  * `redistributeDangling = true` adds the true-PageRank correction:
  * the dangling ranks' damped mass spreads equally over all nodes,
  * computed as ONE extra node-sized aggregate per iteration (a
  * one-row frame cross-joined into the update — no extra driver
  * action), restoring the sum-to-one invariant within integer
  * truncation (spec-asserted bound).
  *
  * Scale shape: per iteration, one equi-join of the edge list with
  * the node-sized rank frame on `src` (ranks broadcast when small,
  * shuffle-on-src otherwise) and one map-side-combinable sum by
  * `dst`. The rank frame is NODE-sized, never corpus-sized; lineage
  * is truncated per round with Scale.shared (the CC / Lloyd
  * pattern; lazy since r20 — rounds chain into the final action). The only driver materialization is the node COUNT — one
  * scalar.
  */
object LinkGraph {

  /** Fixed-point PageRank over `(src, dst)` string edges. Returns
    * one row per node: `host`, integer `rank` (scale 10^12), and
    * `n_in` (distinct in-links). Self-loops and duplicate edges are
    * dropped; `iters` is the unrolled iteration count.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false
  ): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(Scale.shared) // lazy (r20): the node-count action materializes
    val outd = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .transform(Scale.shared)
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
      val updated = nodes
        .join(contribs, nodes("host") === contribs("dst"), "left")
        .select(col("host"), (lit(base) + coalesce(col("c"), lit(0L))).as("rank"))
      ranks =
        (if (!redistributeDangling) updated
         else {
           // damped mass of rank sitting on dangling nodes (no
           // out-edges), spread equally: one node-sized aggregate to a
           // ONE-ROW frame, cross-joined into the update (broadcast
           // nested loop over a single row — no driver action)
           val dang = ranks
             .join(outd, ranks("host") === outd("src"), "left_anti")
             .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
           updated.crossJoin(dang)
             .select(col("host"),
               (col("rank") + expr(s"(85 * dmass) div (100 * ${n}L)")).as("rank"))
         }).transform(Scale.shared) // lazy: K rounds chain into the final action
    }
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("n_in"))
    ranks
      .join(indeg, ranks("host") === indeg("dst"), "left")
      .select(col("host"), col("rank"), coalesce(col("n_in"), lit(0L)).as("n_in"))
  }

  /** Community detection by DETERMINISTIC synchronous label
    * propagation (Raghavan et al. 2007's LPA, made cross-engine
    * checkable): the graph is symmetrized (near-dup "same community"
    * is an undirected notion), every node starts labeled with its own
    * host string, and each of `iters` synchronous rounds relabels
    * every node with its neighbors' MOST FREQUENT label — ties broken
    * by the lexicographically smallest label. Classic LPA breaks ties
    * randomly and updates asynchronously, which is irreproducible
    * across partitionings, let alone engines; frequency-then-min is a
    * pure function of the round's label frame, so K unrolled rounds
    * replay exactly in the SQL oracle (count + row_number are both
    * engines' native algebra — no floats anywhere).
    *
    * Curation use: communities over the host link graph group mirror
    * farms / template networks the per-document near-dup passes can't
    * see, the same authority-side signal family as [[pageRank]].
    *
    * Scale shape: per round, one equi-join of the edge list against
    * the NODE-sized label frame on `src` (broadcast when the graph's
    * node set is dim-sized, shuffle-on-src otherwise), one map-side-
    * combinable (host, label) count, one node-partitioned window for
    * the argmax — never anything corpus-sized; lineage truncated per
    * round with Scale.shared (the CC / Lloyd / pageRank pattern;
    * lazy since r20).
    * Synchronous LPA on a symmetric graph can 2-cycle on bipartite
    * islands instead of converging — callers pick `iters` as a fixed
    * budget (the curation signal needs stable coarse communities, not
    * a fixpoint proof).
    *
    * Returns one row per node: `host`, `community` (final label), and
    * `n_members` (community size).
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val dir = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    val e = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(Scale.shared) // lazy (r20)
    var labels = e.select(col("src").as("host")).distinct()
      .withColumn("label", col("host"))
      .transform(Scale.shared)
    for (_ <- 1 to iters) {
      val freq = e.join(labels, e("src") === labels("host"))
        .groupBy(e("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("cnt").desc, col("label").asc)
      labels = freq.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node").as("host"), col("label"))
        .transform(Scale.shared)
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "label")
      .select(col("host"), col("label").as("community"), col("n_members"))
  }
}
