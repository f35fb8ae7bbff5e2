package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental AGGREGATE maintenance — the rollup analog of the
  * persistent dedup/ANN indexes: a per-group stats table (count, sum,
  * min, max, quantile synopsis) that an arriving increment FOLDS INTO
  * without re-reading the base data. Sums/counts add, min/max lattice,
  * and the distinct-sampling quantile synopsis merges EXACTLY by the
  * semilattice law ([[graft.functions.KmvQuantileAgg]]) — so
  * maintained stats ≡ stats recomputed from scratch, which is what
  * the gate verifies cross-engine.
  *
  * Layout: one row per (key, synopsis entry) — `(key, n, s, mn, mx)`
  * carried on the entry rows' group — kept ≤ k entries per key. The
  * merge is PLAIN column algebra (union → count-sum on shared hashes
  * → k-min trim by hash), no driver loops; an append shuffles only
  * group-cardinality-sized frames, never the corpus.
  */
object StatsTable {

  // stats are over NON-NULL values: n counts the same population the
  // sum/synopsis cover (a key with no non-null values has no stats
  // row — mixed semantics where n disagrees with the synopsis total
  // would poison every later fold)
  private def summarize(df: DataFrame, keyCol: String, valCol: String, k: Int): DataFrame =
    df
      .filter(col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("n"), sum(col(valCol)).as("s"),
        min(col(valCol)).as("mn"), max(col(valCol)).as("mx"),
        expr(s"kmv_quantile_sketch($valCol, $k)").as("sk"))
      .select(col("key"), col("n"), col("s"), col("mn"), col("mx"),
        explode(col("sk")).as("e"))
      .select(col("key"), col("n"), col("s"), col("mn"), col("mx"),
        split(col("e"), ":").getItem(0).as("h"),
        split(col("e"), ":").getItem(1).cast("long").as("v"),
        split(col("e"), ":").getItem(2).cast("long").as("c"))

  /** Build the stats table for `df` (value column must be BIGINT). */
  def write(df: DataFrame, keyCol: String, valCol: String, path: String, k: Int = 64): Unit =
    summarize(df, keyCol, valCol, k).write.mode("overwrite").parquet(path)

  /** Fold an increment into the stored table: scalar stats combine by
    * their monoids, synopsis entries by count-sum + k-min trim — the
    * same algebra the aggregate's own merge runs, in column form.
    */
  def append(increment: DataFrame, keyCol: String, valCol: String, path: String, k: Int = 64): Unit = {
    val spark = increment.sparkSession
    // both sides feed TWO plan branches (scalars + entries); checkpoint
    // the group-sized frames so neither the increment aggregation nor
    // the stored scan runs twice
    val stored = Scale.shared(spark.read.parquet(path))
    val inc    = Scale.shared(summarize(increment, keyCol, valCol, k))
    // per (key, row-group) scalar stats are constant on entry rows;
    // reduce each side to one scalar row per key + its entry rows
    def scalars(t: DataFrame) = t.groupBy(col("key"))
      .agg(first(col("n")).as("n"), first(col("s")).as("s"),
        first(col("mn")).as("mn"), first(col("mx")).as("mx"))
    val mergedScalars = scalars(stored).unionByName(scalars(inc))
      .groupBy(col("key"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    val mergedEntries = stored.select(col("key"), col("h"), col("v"), col("c"))
      .unionByName(inc.select(col("key"), col("h"), col("v"), col("c")))
      .groupBy(col("key"), col("h"))
      .agg(first(col("v")).as("v"), sum(col("c")).as("c"))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("key")).orderBy(col("h"))))
      .filter(col("__rk") <= k)
      .drop("__rk")
    // stored's checkpoint above already severed the lineage from the
    // files this overwrite replaces
    mergedEntries.join(mergedScalars, Seq("key"))
      .select(col("key"), col("n"), col("s"), col("mn"), col("mx"),
        col("h"), col("v"), col("c"))
      .write.mode("overwrite").parquet(path)
  }

  /** Read the table back as one row per key: scalar stats + the p-th
    * percentile estimate from the stored synopsis (entries re-merged
    * through the same aggregate that built them).
    */
  def read(spark: SparkSession, path: String, k: Int = 64, p: Int = 50): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("key"))
      .agg(first(col("n")).as("n"), first(col("s")).as("s"),
        first(col("mn")).as("mn"), first(col("mx")).as("mx"),
        expr(s"kmv_quantile_merge(concat(h, ':', v, ':', c), $k, $p)").as(s"p${p}_est"))
}
