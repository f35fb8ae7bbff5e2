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
  * the default 64 matches the BM25 postings layout and is plenty at
  * test scale; a 1000-executor build raises it WITHOUT a code change
  * via `spark.graft.index.buckets` (read per write, so one session
  * can build a 4096-way base index and leave probe-side scratch
  * tables at the default).
  *
  * APPEND sizing (r15 advice): a base build wants the full fan-out,
  * but an append-mode ledger write adds its own file set on EVERY
  * increment — 64 files for a 100-row daily increment inflates
  * file-listing and scan cost on the index side of every probe for
  * no parallelism gain. Append-shaped callers therefore pass
  * `sizeByStats = true`: the bucket count is ⌈Catalyst optimized-plan
  * size / `spark.graft.index.append.bytesPerBucket` (64 MiB)⌉ capped
  * at the configured fan-out — a daily increment lands as ONE file, a
  * month-scale crawl fold still fans out. Catalyst overestimates
  * post-aggregation frames, which errs CONSERVATIVE here (more write
  * tasks than strictly needed, never a single-task funnel).
  *
  * Single-task writes remain correct — and required — for one-row
  * meta tables; only corpus-sized artifacts route through here
  * (asserted by `IndexLayoutSpec`, which fails any listed builder
  * that writes its corpus-sized table as a single file).
  */
object IndexLayout {

  /** Default bucket fan-out, aligned with the BM25 postings layout.
    * Overridden per session by `spark.graft.index.buckets`.
    */
  val DefaultBuckets: Int = 64

  /** Target bytes of (Catalyst-estimated) data per bucket file for
    * stats-sized append writes. Overridden per session by
    * `spark.graft.index.append.bytesPerBucket`.
    */
  val DefaultAppendBytesPerBucket: Long = 64L << 20

  /** The session-configured bucket fan-out: `spark.graft.index.buckets`
    * when set (validated — a zero/negative/garbage value would either
    * crash `repartition` or silently recreate the single-task funnel
    * this layout exists to prevent), else [[DefaultBuckets]].
    */
  def configuredBuckets(df: DataFrame): Int = {
    val s = df.sparkSession.conf
      .get("spark.graft.index.buckets", DefaultBuckets.toString)
    val v =
      try s.toInt
      catch { case _: NumberFormatException => throw new IllegalArgumentException(
        s"spark.graft.index.buckets must be a positive integer, got '$s'") }
    require(v > 0, s"spark.graft.index.buckets must be a positive integer, got '$s'")
    v
  }

  private def configuredBytesPerBucket(df: DataFrame): Long = {
    val s = df.sparkSession.conf
      .get("spark.graft.index.append.bytesPerBucket", DefaultAppendBytesPerBucket.toString)
    val v =
      try s.toLong
      catch { case _: NumberFormatException => throw new IllegalArgumentException(
        s"spark.graft.index.append.bytesPerBucket must be a positive byte count, got '$s'") }
    require(v > 0, s"spark.graft.index.append.bytesPerBucket must be a positive byte count, got '$s'")
    v
  }

  /** Stats-sized bucket count for an append: one bucket per
    * `bytesPerBucket` of Catalyst's optimized-plan size estimate,
    * in [1, maxBuckets]. Costs no Spark job (plan stats only).
    */
  def appendBuckets(df: DataFrame, maxBuckets: Int): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val per = BigInt(configuredBytesPerBucket(df))
    val n   = (est + per - 1) / per
    n.min(BigInt(maxBuckets)).max(BigInt(1)).toInt
  }

  /** Write `df` hash-bucketed by `keys` through parallel tasks.
    *
    * `buckets` ≤ 0 (the default) resolves to the session-configured
    * fan-out ([[configuredBuckets]]); an explicit positive value wins.
    * `sizeByStats = true` (append-shaped ledger writes) additionally
    * caps the fan-out by the plan-size heuristic ([[appendBuckets]])
    * so small increments don't shard into 64 near-empty files.
    * `partitionCols` threads through to `DataFrameWriter.partitionBy`
    * for `inc=`-ledger layouts (the caller sets
    * `partitionOverwriteMode` via `options`).
    *
    * Append-mode callers compose: each append adds its own file set
    * and fold-on-read min/sum-folds across all of them, exactly as it
    * folded across `coalesce(1)` ledger rows before.
    */
  def write(
      df: DataFrame, dir: String, mode: SaveMode, keys: Seq[Column],
      buckets: Int = 0, partitionCols: Seq[String] = Nil,
      sizeByStats: Boolean = false,
      options: Map[String, String] = Map.empty): Unit = {
    require(keys.nonEmpty, "IndexLayout.write needs at least one bucketing key")
    val maxB = if (buckets > 0) buckets else configuredBuckets(df)
    val b    = if (sizeByStats) appendBuckets(df, maxB) else maxB
    val w = df.repartition(b, keys: _*).write.mode(mode).options(options)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir)
  }
}
