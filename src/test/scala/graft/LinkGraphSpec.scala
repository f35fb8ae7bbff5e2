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

  // ------------------------------------------------------------------
  // label propagation
  // ------------------------------------------------------------------

  test("labelPropagation separates two planted 4-cliques joined by one bridge edge") {
    // clique A {a1..a4}, clique B {b1..b4}, one bridge a1->b1;
    // directed input — symmetrization is the operator's job. (With
    // 3-cliques the deterministic min-label tie-break floods label a1
    // across the bridge — a known LPA dynamic; 4-cliques give every
    // node a strict in-clique majority and the communities hold.)
    val cl = for {
      g <- Seq("a", "b"); i <- 1 to 4; j <- 1 to 4 if i < j
    } yield (s"$g$i", s"$g$j")
    val edges = (cl :+ ("a1", "b1")).toDF("src", "dst")
    val out = LinkGraph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.keySet === (1 to 4).flatMap(i => Seq(s"a$i", s"b$i")).toSet)
    val aComm = (1 to 4).map(i => out(s"a$i")._1).toSet
    val bComm = (1 to 4).map(i => out(s"b$i")._1).toSet
    assert(aComm.size === 1, s"clique A split: $out")
    assert(bComm.size === 1, s"clique B split: $out")
    assert(aComm.head !== bComm.head, "bridge edge merged the two cliques")
    out.foreach { case (h, (c, n)) =>
      assert(n === out.count(_._2._1 == c), s"n_members wrong for $h") }
  }

  test("labelPropagation replays by hand on a 4-node path (frequency argmax, min-label ties)") {
    // path a - b - c - d; after symmetrization every neighbor multiset
    // has distinct labels, so round 1 is pure min-label: a->b? a's
    // only neighbor is b => label b; b's neighbors {a,c} tie at 1 =>
    // min "a"; c: {b,d} => "b"; d: {c} => "c". Replay 3 rounds.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val und = Map(
      "a" -> Seq("b"), "b" -> Seq("a", "c"), "c" -> Seq("b", "d"), "d" -> Seq("c"))
    var lab = Map("a" -> "a", "b" -> "b", "c" -> "c", "d" -> "d")
    for (_ <- 1 to 3) {
      lab = und.map { case (n, nbrs) =>
        val freq = nbrs.map(lab).groupBy(identity).view.mapValues(_.size).toMap
        val best = freq.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        n -> best
      }
    }
    val out = LinkGraph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === lab)
  }

  test("labelPropagation is partition-layout invariant (deterministic tie-breaks)") {
    val edges = (1 to 400).map(i => (s"h${i % 37}", s"h${(i * 13) % 41}")).toDF("src", "dst")
    val one = LinkGraph.labelPropagation(edges.repartition(1), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val many = LinkGraph.labelPropagation(edges.repartition(16), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(one === many)
  }
}
