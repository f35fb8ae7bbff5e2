package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming extension (SURVEY §2.9: the reference is
  * batch-only; its "incremental" behavior is skip-processed-file
  * memoization). The engine runs the same tumbling-window aggregation
  * in batch and streaming — identical frames, so the batch query IS
  * the oracle for the stream.
  */
object EventsStream {

  /** Tumbling-window event rollup (batch form, oracle-checkable).
    * value sums go through decimal so the partial-agg sum is exact
    * and order-independent (same convention as the money queries).
    */
  def windowedCounts(events: DataFrame, windowExpr: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value")
      )
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value")
      )

  /** Same rollup as a file-source stream with a watermark for late
    * data; memory sink for synchronous local verification. `prep`
    * adapts raw columns (e.g. epoch-nanos long → timestamp) before
    * the event-time watermark is applied.
    */
  def streamWindowedCounts(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      queryName: String,
      windowExpr: String = "1 hour",
      watermark: String = "2 hours",
      prep: DataFrame => DataFrame = identity,
      globFilter: Option[String] = None
  ): StreamingQuery = {
    val reader0 = spark.readStream.schema(schema)
    val reader  = globFilter.fold(reader0)(g => reader0.option("pathGlobFilter", g))
    val src     = prep(reader.parquet(dir))
    val agg = src
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value")
      )
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming dedup-within-watermark: drop events whose
    * (user_id, event_type, value) repeats inside the state window —
    * the streaming face of the Dedup family.
    */
  def streamDedup(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      queryName: String,
      watermark: String = "2 hours",
      prep: DataFrame => DataFrame = identity,
      globFilter: Option[String] = None
  ): StreamingQuery = {
    val reader0 = spark.readStream.schema(schema)
    val reader  = globFilter.fold(reader0)(g => reader0.option("pathGlobFilter", g))
    prep(reader.parquet(dir))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
}
