package graft

import graft.ops.LinkGraph

import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank: hand-replay on a known graph,
  * layout invariance, and edge hygiene (self-loops / duplicates).
  */
class LinkGraphSpec extends SparkSpecBase {
  import spark.implicits._

  private val S = 1000000000000L

  test("pageRank matches a hand replay on a 4-node graph") {
    // a -> b, a -> c, b -> c, c -> a, d -> c   (d is rankless source,
    // a/b/c cycle; c collects the most in-links)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
      .toDF("src", "dst")
    val out = LinkGraph.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // replay the exact integer algebra
    val n     = 4L
    val base  = (15L * S) / (100L * n)
    val outd  = Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    var rank  = Map("a" -> S / n, "b" -> S / n, "c" -> S / n, "d" -> S / n)
    val eList = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    for (_ <- 1 to 3) {
      val contribs = eList
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (src, _) => (85L * rank(src)) / (100L * outd(src)) }.sum
        }
      rank = rank.keys.map(h => h -> (base + contribs.getOrElse(h, 0L))).toMap
    }
    assert(out.keySet === Set("a", "b", "c", "d"))
    rank.foreach { case (h, r) => assert(out(h)._1 === r, s"rank($h)") }
    assert(out("c")._2 === 3L && out("d")._2 === 0L, "in-degrees")
    assert(out("c")._1 > out("a")._1 && out("a")._1 > out("d")._1,
      "authority ordering: c > a > d")
  }

  test("pageRank is partition-layout invariant") {
    val edges = (1 to 400).map(i => (s"h${i % 37}", s"h${(i * 13) % 41}")).toDF("src", "dst")
    val one  = LinkGraph.pageRank(edges.repartition(1), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = LinkGraph.pageRank(edges.repartition(16), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
  }

  test("redistributeDangling conserves total mass within integer truncation") {
    // b and d are dangling (no out-edges): the default variant leaks
    // their damped rank every iteration; the redistributing variant
    // must keep sum(rank) ≈ scale
    val edges = Seq(("a", "b"), ("a", "c"), ("c", "d"), ("c", "a")).toDF("src", "dst")
    val iters = 4
    val n     = 4L
    val eCnt  = 4L
    def total(redistribute: Boolean): Long =
      LinkGraph.pageRank(edges, iters, redistributeDangling = redistribute)
        .agg(sum(col("rank"))).collect()(0).getLong(0)

    val conserved = total(redistribute = true)
    // truncating division only ever LOSES mass: per iteration at most
    // one unit per edge contribution, one per node for the teleport
    // base, one per node for the dangling share (+ the initial split)
    val bound = (iters + 1) * (eCnt + 2 * n)
    assert(conserved <= S, "truncation cannot create mass")
    assert(S - conserved <= bound,
      s"mass conserved within truncation: deficit ${S - conserved} > bound $bound")

    // the leaking default loses real mass — orders beyond truncation
    val leaky = total(redistribute = false)
    assert(S - leaky > 100L * bound,
      s"default variant should visibly leak (deficit ${S - leaky})")
  }

  test("redistributeDangling stays deterministic across partition layouts") {
    val edges = (1 to 400).map(i => (s"h${i % 37}", s"h${(i * 13) % 41}")).toDF("src", "dst")
    val one = LinkGraph.pageRank(edges.repartition(1), 3, redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = LinkGraph.pageRank(edges.repartition(16), 3, redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
  }

  test("pageRank drops self-loops and duplicate edges") {
    val messy = Seq(("a", "a"), ("a", "b"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    val clean = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val rm = LinkGraph.pageRank(messy, 2).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rc = LinkGraph.pageRank(clean, 2).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rm === rc)
  }
}
