package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture between keyed table snapshots, and the apply
  * side that folds a change set back into a base table — the
  * incremental-processing primitive for re-crawled corpora and
  * warehouse MERGE pipelines: diff yesterday's snapshot against
  * today's, then drive ONLY the changed rows through downstream
  * operators (the dedup/ANN/stats incremental-maintenance paths in
  * this library all take exactly such an increment).
  *
  * Scale shape: [[snapshotDiff]] is ONE full-outer equi-join on the
  * key — both sides shuffle once, comparison happens in the join
  * projection (no row-hash pre-pass, no window), AQE splits skewed
  * keys. [[applyChanges]] is one left-anti join (change set broadcast
  * when it is increment-sized, which is the point of CDC) plus a
  * union. The round-trip law `applyChanges(old, snapshotDiff(old,
  * new)) ≡ new` is oracle-gated (`x_cdc_apply`).
  *
  * Keys must be non-null (the usual CDC contract); compared columns
  * may be null — comparison is null-safe (`<=>`).
  */
object ChangeCapture {

  /** Diff two keyed snapshots into a change set: one row per key that
    * was inserted, deleted, or whose compared columns changed
    * (null-safe). Emits `change_type` ∈ insert/delete/update with the
    * old AND new value of every compared column (`old_c` / `new_c`;
    * absent side null). Unchanged keys produce no row — the change
    * set is increment-sized, not snapshot-sized.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compare: Seq[String]
  ): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      compare.foldLeft(
        df.select((keys ++ compare).map(col): _*).withColumn(s"__$tag", lit(1)))(
        (d, c) => d.withColumnRenamed(c, s"${tag}_$c"))
    val j = side(oldDf, "old").join(side(newDf, "new"), keys, "full_outer")
    val changed: Column = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    j.filter(col("__old").isNull || col("__new").isNull || changed)
      .select(keys.map(col) ++ Seq(
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .otherwise(lit("update")).as("change_type")) ++
        compare.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Fold a [[snapshotDiff]] change set into `base`: EVERY change-set
    * key drops out of the base (one left-anti join), then
    * insert/update rows come in with their new values (one union).
    * Anti-joining ALL keys — not just delete/update — makes the merge
    * an idempotent UPSERT: against a base that already absorbed this
    * change set (an at-least-once foreachBatch replay whose snapshot
    * overwrite committed but whose checkpoint didn't), the insert
    * keys are anti-joined away before being re-unioned, so re-apply
    * yields the same snapshot instead of duplicating inserts. Against
    * a clean base the extra keys match nothing, so the law
    * `applyChanges(old, snapshotDiff(old, new), keys, compare)` ≡
    * `new` (projected to keys ++ compare) is unchanged.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      compare: Seq[String]
  ): DataFrame = {
    val gone = changes.select(keys.map(col): _*)
    val incoming = changes.filter(col("change_type").isin("insert", "update"))
      .select(keys.map(col) ++ compare.map(c => col(s"new_$c").as(c)): _*)
    base.select((keys ++ compare).map(col): _*)
      .join(gone, keys, "left_anti")
      .unionByName(incoming)
  }
}
