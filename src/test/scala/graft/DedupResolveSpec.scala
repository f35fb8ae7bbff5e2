package graft

import graft.ops.Dedup

import org.apache.spark.sql.functions._

/** Cluster resolution over near-dup pair lists: transitive chains,
  * long-chain convergence (the pointer-jump path), and keep-one
  * semantics incl. singletons.
  */
class DedupResolveSpec extends SparkSpecBase {
  import spark.implicits._

  test("connectedComponents resolves chains transitively to the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 40-link chain converges well inside the iteration budget (pointer jumping)") {
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, maxIters = 12)
    assert(cc.count() === 41)
    assert(cc.select(countDistinct(col("cluster"))).as[Long].head() === 1L)
    assert(cc.agg(max(col("cluster"))).as[Long].head() === 0L)
  }

  test("resolveNearDups keeps the canonical member per cluster and every singleton") {
    val docs  = (1L to 6L).map(i => (i, s"doc $i")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.resolveNearDups(docs, "id", pairs)
      .select(col("id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }

  test("foldClusters ≡ connectedComponents on the union — bridge merge, " +
      "singleton promotion, new-only chain, untouched cluster") {
    // base: {1,2} and {5,6} clustered, 50 a singleton, {8,9} untouched
    val basePairs = Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val baseClusters = Dedup.connectedComponents(basePairs)
    // increment: 100 BRIDGES the two base clusters (they must merge to
    // min id 1 everywhere, including old members of cluster 5), 300
    // pairs with the previously-singleton 50, and {200, 201} is a
    // purely-new chain
    val incPairs = Seq((2L, 100L), (6L, 100L), (50L, 300L), (200L, 201L))
      .toDF("id_a", "id_b")
    val folded = Dedup.foldClusters(baseClusters, incPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(basePairs.unionByName(incPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded === full)
    // and the law holds on the specifics, not just by comparison
    assert(folded(6L) === 1L, "bridge merge must relabel the absorbed cluster's members")
    assert(folded(8L) === 8L && folded(9L) === 8L, "untouched cluster must pass through")
    assert(folded(300L) === 50L && folded(201L) === 200L)
  }

  test("foldClusters with a new id below every base id re-canonicalizes the merged cluster") {
    val baseClusters = Dedup.connectedComponents(Seq((10L, 11L)).toDF("id_a", "id_b"))
    val folded = Dedup.foldClusters(baseClusters, Seq((3L, 11L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded === Map(3L -> 3L, 10L -> 3L, 11L -> 3L))
  }

  test("overlapping clusters merge rather than over-delete") {
    // two pair lists that share node 2: {1,2} and {2,3} must not both
    // elect a survivor independently — one cluster, one survivor
    val docs  = (1L to 3L).map(i => (i, s"d$i")).toDF("id", "text")
    val pairs = Seq((2L, 3L), (1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.resolveNearDups(docs, "id", pairs)
      .select(col("id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L))
  }
}
