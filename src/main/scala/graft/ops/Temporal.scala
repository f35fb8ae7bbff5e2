package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators the DataFrame API has no single verb
  * for: as-of join, interval range join, and time-range moving
  * aggregates. All three are expressed so the only shuffle is the one
  * their semantics force (a hash partition by key, or an equi-join on
  * a blocking bucket) — never a nested-loop inequality join, which is
  * what a naive `ts BETWEEN start AND end` join plans as and what dies
  * first at 100 TB.
  */
object Temporal {

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` on the same key (the time-series
    * point-in-time lookup; DuckDB/kdb spell it ASOF JOIN).
    *
    * Implementation is the union-and-carry formulation, not a join:
    * tag both sides, union them, and carry the most recent right
    * payload forward with `last(_, ignoreNulls)` over a
    * (key, ts, side) window. One hash exchange on the key, one sort —
    * the same cost as sessionization — versus a per-row range probe.
    * At 100 TB this matters twice over: there is no candidate-pair
    * blow-up for keys with many right rows, and AQE's skew-join
    * handling applies to the single exchange.
    *
    * Right rows sort BEFORE left rows at equal timestamps
    * (`side` 0 < 1), making the match inclusive (`<=`). The right side
    * must be unique per (key, ts) — pre-aggregate duplicates, else the
    * carried row at a tied timestamp is partition-order dependent.
    *
    * `direction`: "backward" (default — latest right at or before the
    * left ts, the lookup semantics) or "forward" (earliest right at or
    * after — implemented by carrying over the NEGATED time axis, same
    * single exchange). `tolerance`: maximum |left.ts − right.ts| for a
    * match (integer time units); beyond it the match nulls out —
    * together the full pandas `merge_asof` surface.
    *
    * Output: all left columns plus each right payload column prefixed
    * `asof_` (null when no right row matches).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rPayload = right.columns.filter(c => c != key && c != ts).toSeq
    val lStruct  = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct  = struct((col(ts) +: rPayload.map(col)).toIndexedSeq: _*)
    val lType    = left.select(lStruct.as("s")).schema("s").dataType
    val rType    = right.select(rStruct.as("s")).schema("s").dataType

    val leftU = left.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rightU = right.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val axis = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val carry = Window.partitionBy(col("__k"))
      .orderBy(axis, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched0 = last(col("__r"), ignoreNulls = true).over(carry)
    val matched = tolerance match {
      case Some(tol) =>
        when(abs(col("__ts") - matched0.getField(ts)) <= tol, matched0)
          .otherwise(lit(null).cast(rType))
      case None => matched0
    }
    val asofCols = (ts +: rPayload).map(c => col(s"__m.$c").as(s"asof_$c"))
    leftU.unionByName(rightU)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++ asofCols: _*)
  }

  /** Interval-point range join: pair each point with every interval
    * containing it (`start <= pt <= end`), with NO equi key — the
    * query shape Spark plans as a BroadcastNestedLoopJoin (or worse, a
    * cartesian) if written directly.
    *
    * Blocking: each interval explodes to the coarse time buckets it
    * overlaps (`floor(start/w) .. floor(end/w)`), each point hashes to
    * exactly ONE bucket, and the join is a plain equi-join on the
    * bucket followed by the exact containment filter. Because the
    * point's bucket is unique, a (point, interval) pair can meet in at
    * most one bucket — no dedup stage. Candidate volume is
    * |points| × (intervals overlapping the point's bucket), so pick
    * `bucketWidth` on the order of the typical interval length:
    * shorter floods interval replicas, longer floods candidates.
    * Intervals spanning k buckets replicate k times — bounded by
    * (max interval length / width) + 1, independent of corpus size.
    *
    * `pt`/`start`/`end` are integer columns in any shared time unit.
    * Output: all interval columns + all point columns.
    */
  def rangeJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      ptCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // TRUE integral division (IntegralDivide), not floor(double-div):
    // at epoch-scale integers a double quotient can misplace a value
    // within an ulp of a bucket boundary — and a point mis-bucketed
    // relative to its interval is a silently missed pair (the same
    // trap nanosToTs documents). Time values are non-negative, where
    // `div` ≡ floor division.
    def bucketOf(c: Column) = call_function("div", c.cast("long"), lit(bucketWidth))
    val iv = intervals.withColumn(
      "__bucket", explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pt = points.withColumn("__bucket", bucketOf(col(ptCol)))
    iv.join(pt, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-interval OVERLAP join: pair every left interval with
    * every right interval it overlaps (`max(starts) <= min(ends)`,
    * closed intervals) — the other non-equi temporal join shape
    * ([[rangeJoin]] covers interval × point).
    *
    * Both sides explode to their covered buckets, so an overlapping
    * pair can meet in SEVERAL buckets. Instead of a distinct (a full
    * extra shuffle of the output), each candidate pair is kept only in
    * its OWNER bucket — the bucket containing max(start_a, start_b),
    * which every genuine overlap has exactly one of (the overlap
    * region starts there). Emit-exactly-once falls out of the same
    * equi-join, costing one comparison instead of a dedup exchange —
    * the detail that matters when the output is fact-scale.
    *
    * Replication bound: (interval length / bucketWidth) + 1 per row,
    * independent of corpus size; same width-tuning trade as rangeJoin.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column) = call_function("div", c.cast("long"), lit(bucketWidth))
    val l = left.withColumn(
      "__bucket", explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val r = right.withColumn(
      "__bucket", explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    l.join(r, Seq("__bucket"))
      .filter(greatest(col(lStart), col(rStart)) <= least(col(lEnd), col(rEnd)))
      .filter(col("__bucket") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__bucket")
  }

  /** Time-series regularization: bucket each key's events onto a
    * fixed `step` grid, materialize the MISSING buckets between the
    * key's first and last observation, and forward-fill values
    * (`last(_, ignoreNulls)`). The standard prep step before
    * training on regularly-sampled sequences.
    *
    * Per-bucket value is `max(valCol)` (deterministic under ties, no
    * order dependence). Scale shape: the grid explodes from per-key
    * (lo, hi) spans — grid size is span/step per key, controlled by
    * the caller's step, never |corpus|²; one keyed aggregation, one
    * keyed join, one window, all on the same key so AQE can reuse
    * the partitioning.
    *
    * Output: (key, bucket_ts, value, observed) — `value` null only
    * for gap rows before the key's first observation (none, by
    * construction of the span).
    */
  def gapFill(
      events: DataFrame,
      key: String,
      ts: String,
      valCol: String,
      step: Long
  ): DataFrame = {
    require(step > 0, "step must be positive")
    // Same integral-division discipline as rangeJoin.bucketOf: floor of a
    // double quotient can land an ulp off the boundary at epoch-scale
    // magnitudes, silently shifting a grid cell. Unlike the join
    // blocking key (where any monotone bucketing works), bucket_ts is
    // exposed as the grid cell START, so the division must floor —
    // `div` truncates toward zero and would put a pre-1970 negative
    // timestamp in a bucket that starts after it. ts - pmod(ts, step)
    // is exact floor-to-multiple in pure long arithmetic.
    val obs = events
      .withColumn("__b",
        (col(ts).cast("long") - pmod(col(ts).cast("long"), lit(step))).cast("long"))
      .groupBy(col(key), col("__b"))
      .agg(max(col(valCol)).as("__v"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"), lit(step))).as("__b"))
    val carry = Window.partitionBy(col(key)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(key, "__b"), "left")
      .select(col(key), col("__b").as("bucket_ts"),
        last(col("__v"), ignoreNulls = true).over(carry).as("value"),
        col("__v").isNotNull.cast("int").as("observed"))
  }

  /** Per-key time-range moving aggregates: for every event, the count
    * and sum of `valCol` over the trailing `rangeBack` time units
    * (inclusive of the current row and its RANGE peers), plus the gap
    * to the previous event. One hash exchange by key, one sort — the
    * RANGE frame and the lag ride the same sorted partition (the
    * (ts, tieCol) sort satisfies the RANGE frame's ts-prefix
    * ordering, so Spark plans a single Window exchange+sort).
    *
    * Sum accumulates in DECIMAL so the result is independent of
    * intra-frame order — the double sum of a sliding frame would
    * otherwise depend on which peer rows entered first.
    */
  def movingWindow(
      events: DataFrame,
      key: String,
      ts: String,
      tieCol: String,
      valCol: String,
      rangeBack: Long
  ): DataFrame = {
    val byTs = Window.partitionBy(col(key)).orderBy(col(ts).asc)
      .rangeBetween(-rangeBack, Window.currentRow)
    val byTie = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tieCol).asc)
    events
      .withColumn("gap", col(ts) - lag(col(ts), 1).over(byTie))
      .withColumn("n_window", count(lit(1)).over(byTs))
      .withColumn("sum_window",
        round(sum(col(valCol).cast("decimal(18,2)")).over(byTs).cast("double"), 2))
  }
}
