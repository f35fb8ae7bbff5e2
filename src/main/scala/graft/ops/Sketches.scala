package graft.ops

import graft.functions.KmvDistinctAgg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-algebra estimators over KMV synopses (`kmv_sketch` output —
  * a sorted array of k-min md5 hex hashes). The point of the sketch
  * family: per-group synopses COMPOSE — union, Jaccard and
  * intersection sizes of any two groups are answerable from their
  * k·32-byte sketches without touching the corpus again (Beyer et
  * al., SIGMOD'07). At 100 TB: sketch once per partition/day/source,
  * answer overlap questions forever from the synopsis table.
  *
  * Everything here is deterministic integer/double arithmetic over
  * hex order statistics, so a SQL oracle replays it hash-exactly.
  */
object Sketches {

  /** Hex fraction of a hash's first 12 nibbles, in [0, 1). */
  def hexFrac(h: Column): Column =
    conv(substring(h, 1, 12), 16, 10).cast("long") / lit(KmvDistinctAgg.Denom)

  /** Distinct estimate from a sketch: exact below k, else (k−1)/u_k. */
  def estimateFromSketch(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / hexFrac(element_at(sk, k)))

  /** Sketch of the UNION of two sketched sets: the k smallest of the
    * merged synopses (a valid KMV sketch of A ∪ B by construction).
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard estimate: the share of the union synopsis that both
    * sides' synopses contain.
    */
  def jaccardEst(a: Column, b: Column, k: Int): Column = {
    val ku = unionSketch(a, b, k)
    // two empty inputs → empty union → define J(∅,∅) = 0, not 0/0 NaN
    when(size(ku) === 0, lit(0.0)).otherwise(
      size(filter(ku, h => array_contains(a, h) && array_contains(b, h))).cast("double") /
        size(ku).cast("double"))
  }

  /** Intersection-size estimate: Jaccard × union estimate. */
  def intersectEst(a: Column, b: Column, k: Int): Column =
    jaccardEst(a, b, k) * estimateFromSketch(unionSketch(a, b, k), k)
}
