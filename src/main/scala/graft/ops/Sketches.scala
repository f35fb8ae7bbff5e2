package graft.ops

import graft.functions.KmvDistinctAgg

import org.apache.spark.sql.{Column, DataFrame}
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

  // --------------------------------------------------------------------
  // Bloom filter: the membership twin of the KMV family. A seen-set of
  // n keys collapses to m bits; "maybe contains" then answers from the
  // synopsis with zero false NEGATIVES — the property that makes it the
  // standard 100 TB anti-join/semi-join prune (only the `maybe` rows
  // reach the expensive join; the definite-no bulk never shuffles).
  //
  // Layout is SPARSE (word_id, bits) rows, 32 set bits per long word:
  // build is one map-side-combinable groupBy(word) bit_or — the shuffle
  // carries at most m/32 words per partition regardless of corpus size;
  // merge of two filters (same m, kHash) is the same bit_or over the
  // unioned word rows; probe collapses the words into ONE broadcast map
  // row and tests k bits per probe value inside codegen — no explode,
  // no regroup, zero probe-side shuffle.
  //
  // Hashing is the repo-wide deterministic md5 family (position_j =
  // first 8 md5 nibbles of "<value>:<j>" mod m), so a SQL oracle
  // replays the filter bit-for-bit — the same gateability trade the KMV
  // sketch makes vs xxhash.
  // --------------------------------------------------------------------

  /** The kHash bit positions of `v` (a string column), each in
    * [0, mBits). First 8 md5 nibbles < 2^32, exact in double and long.
    */
  def bloomPositions(v: Column, mBits: Int, kHash: Int): Column =
    transform(sequence(lit(0), lit(kHash - 1)), j =>
      pmod(conv(substring(md5(concat(v, lit(":"), j.cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(mBits.toLong)))

  /** Build a Bloom filter over `valueCol` (stringified): sparse
    * (word, bits) rows, word = position div 32, bit mask = 2^(pos mod
    * 32) — masks < 2^32 keep every word non-negative in a long, so the
    * bit algebra is sign-free on both engines. Duplicate values cost
    * nothing (bit_or is idempotent), so no distinct pass is needed.
    */
  def bloomBuild(df: DataFrame, valueCol: String, mBits: Int, kHash: Int): DataFrame =
    df.select(explode(bloomPositions(col(valueCol).cast("string"), mBits, kHash)).as("pos"))
      .select(shiftrightunsigned(col("pos"), 5).as("word"),
        pow(lit(2.0), pmod(col("pos"), lit(32L))).cast("long").as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))

  /** Merge Bloom filters built with the SAME (mBits, kHash): the
    * bitwise OR of their word sets — union semantics by construction.
    */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))

  /** Probe: adds a boolean `maybe` column to `probe` — true iff every
    * one of the value's kHash bits is set. The filter's word rows
    * collapse into a single broadcast map (≤ mBits/32 entries), so the
    * probe is a per-row map lookup inside codegen: the probe side never
    * shuffles, which is the whole point of a Bloom prune at scale.
    * No false negatives: a value that was built in always probes true.
    */
  def bloomMaybeContains(sketch: DataFrame, probe: DataFrame,
      valueCol: String, mBits: Int, kHash: Int): DataFrame = {
    val words = broadcast(
      sketch.agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("bloom_words")))
    probe.crossJoin(words)
      .withColumn("maybe",
        forall(bloomPositions(col(valueCol).cast("string"), mBits, kHash), p => {
          val bits = coalesce(
            element_at(col("bloom_words"), shiftrightunsigned(p, 5)), lit(0L))
          val mask = pow(lit(2.0), pmod(p, lit(32L))).cast("long")
          bits.bitwiseAND(mask) === mask
        }))
      .drop("bloom_words")
  }
}
