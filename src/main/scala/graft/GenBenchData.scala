package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not part of the shipped library): synthesizes an
  * sf1-scale BENCH dataset as a 10× structured upscale of the
  * driver's sf0.1 tables, so the scaling-slope pass has a point where
  * timings clear the fixed-cost floor (the driver generates testdata
  * only up to sf0.1). Output is for `Bench` ONLY — the correctness
  * oracle always runs on driver-generated data.
  *
  * Upscale rules (copy i ∈ 0..9), chosen so each query's work grows
  * ~linearly — i.e. the slope pass measures the ENGINE, not an
  * artifact of duplicated data:
  *   - fact keys offset by i·10⁷ (o_orderkey/l_orderkey share the
  *     offset, so order↔lineitem joins replicate per copy); dim keys
  *     (nation, custkey, partkey, suppkey) unchanged — dims stay dims.
  *   - timestamps shift per copy (events +35 days, orders/lineitem
  *     +2500 days, both sides of each relation equally): temporal
  *     DENSITY stays constant, so sessionization, as-of, moving
  *     windows and interval joins replicate per copy instead of
  *     interleaving (10× data → 10× sessions, not fused ones; range
  *     join candidates grow 10×, not 100×).
  *   - document tokens get a per-copy suffix: cross-copy jaccard is 0,
  *     so near-dup structure (planted + natural pairs) replicates per
  *     copy — pair count grows 10×, never quadratically as verbatim
  *     copies would (every doc would become a 10-member cluster).
  *   - embeddings perturb per (copy, dim): copies are NOT colinear,
  *     so near-dup blocking isn't flooded; ANN query vectors
  *     (vec_id < 5) exist only in copy 0, keeping probe count fixed
  *     while the corpus scans 10×.
  */
object GenBenchData {

  private val Copies  = 10
  private val DayNs   = 86400L * 1000000000L

  /** Per-level upscale parameters. Level "sf1" (default) is the 10×
    * structured upscale of the driver's sf0.1; level "sf10" re-applies
    * the same rules to a generated sf1 with every offset/shift a
    * decade wider, so keys never collide with the inner level's
    * offsets, per-copy time windows clear the inner level's full span
    * (events 10·35 d, orders 10·2500 d), and the doc-token suffix
    * alphabet is disjoint ("y" vs "x") to keep cross-copy jaccard 0.
    */
  private final case class Level(
    keyOff: Long, docOff: Long, eventShiftDays: Long,
    orderShiftDays: Long, suffix: String, embSeed: Int)
  private val Levels = Map(
    "sf1"  -> Level(10000000L, 1000000L, 35L, 2500L, "x", 31),
    "sf10" -> Level(100000000L, 10000000L, 350L, 25000L, "y", 37))

  private def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Copies).map(i => f(df, i)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/benchdata/sf1"
    val lvl = Levels(if (args.length > 2) args(2) else "sf1")
    val KeyOff = lvl.keyOff
    val spark  = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-gen-sf1")
    def src(name: String) = GraftSession.table(spark, srcDir, name)
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[gen] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    // dims: unchanged
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(t, src(t))

    // session TZ is UTC, so NTZ→timestamp is the identity; written
    // back as micros TIMESTAMP — every consumer goes through
    // unix_micros(cast("timestamp")), identical on both encodings
    def shiftDays(c: String, days: Long) =
      timestamp_micros(unix_micros(col(c).cast("timestamp")) + lit(days * 86400L * 1000000L))

    write("orders", copies(src("orders")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * KeyOff))
        .withColumn("o_orderdate", shiftDays("o_orderdate", i * lvl.orderShiftDays))
    })

    write("lineitem", copies(src("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * KeyOff))
        .withColumn("l_shipdate", shiftDays("l_shipdate", i * lvl.orderShiftDays))
    })

    // events.ts is an epoch-nanos long under nanosAsLong.
    // Written as a single FILE named events.parquet (not a directory):
    // the streaming queries discover source files with
    // pathGlobFilter("events.parquet"), which matches leaf file names —
    // part-files inside a directory would silently match nothing and
    // the streams would run empty.
    val eventsUp = copies(src("events")) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * KeyOff))
        .withColumn("ts", col("ts") + lit(i * lvl.eventShiftDays * DayNs))
    }
    val tmp = s"$outDir/_events_tmp"
    eventsUp.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val target = java.nio.file.Paths.get(s"$outDir/events.parquet")
    // a previous run may have left a DIRECTORY at this path
    val old = new java.io.File(s"$outDir/events.parquet")
    if (old.isDirectory) { old.listFiles().foreach(_.delete()); old.delete() }
    java.nio.file.Files.deleteIfExists(target)
    java.nio.file.Files.move(part.toPath, target)
    new java.io.File(tmp).listFiles().foreach(_.delete())
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
    println(s"[gen] events: ${spark.read.parquet(s"$outDir/events.parquet").count()} rows")

    write("documents", copies(src("documents")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * lvl.docOff))
        .withColumn("text",
          if (i == 0) col("text")
          else array_join(
            transform(filter(split(col("text"), " "), t => t =!= ""),
              t => concat(t, lit(s"${lvl.suffix}$i"))), " "))
    })

    write("embeddings", copies(src("embeddings")) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * lvl.docOff))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) =>
            (x * (lit(1.0f) + (pmod(lit(i * lvl.embSeed) + j * 7, lit(11)) - lit(5)).cast("float") * lit(0.07f)))
              .cast("float")))
    })

    spark.stop()
  }
}
