package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** Hash-bucketed parquet layout for CORPUS-SIZED persisted index and
  * model tables — the write-path twin of the BM25 postings layout.
  *
  * Why this exists: every persisted-index *probe* in this repo is
  * O(increment) (broadcast-semi prune, equi-join on the key), but the
  * *base build* of several indexes used to funnel the whole artifact
  * through `coalesce(1)` — ONE write task. Fine for one-row meta
  * scalars and dim×dim matrices; a genuine scale-killer for
  * corpus-sized tables (the canon index is distinct-contents-sized,
  * the winnow print set is occurrence-sized, bigram/KN count tables
  * at trillion-token scale are 10⁹⁺ rows). `repartition(buckets,
  * key…)` writes the same rows through `buckets` parallel tasks,
  * key-bucketed so one key's ledger rows land in one file (min/sum
  * fold locality) — and readers are untouched: same schema, same
  * directory, fold-on-read already absorbs multi-file layouts.
  *
  * The bucket count is a WRITE-parallelism knob, not a semantic one:
  * 64 matches the BM25 postings default and is plenty at test scale;
  * a 1000-executor build would raise it (or set
  * `spark.sql.shuffle.partitions`-sized) without touching readers.
  *
  * Single-task writes remain correct — and required — for one-row
  * meta tables; only corpus-sized artifacts route through here
  * (asserted by `IndexLayoutSpec`, which fails any listed builder
  * that writes its corpus-sized table as a single file).
  */
object IndexLayout {

  /** Default bucket fan-out, aligned with the BM25 postings layout. */
  val DefaultBuckets: Int = 64

  /** Write `df` hash-bucketed by `keys` through `buckets` parallel
    * tasks. Append-mode callers (ledger appends) compose: each append
    * adds its own ≤`buckets` files and fold-on-read min/sum-folds
    * across all of them, exactly as it folded across `coalesce(1)`
    * ledger rows before.
    */
  def write(
      df: DataFrame, dir: String, mode: SaveMode, keys: Seq[Column],
      buckets: Int = DefaultBuckets): Unit = {
    require(keys.nonEmpty, "IndexLayout.write needs at least one bucketing key")
    df.repartition(buckets, keys: _*)
      .write.mode(mode).parquet(dir)
  }
}
