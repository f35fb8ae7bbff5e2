package graft

import org.apache.spark.sql.functions._

/** Dev tool: micro-costs of the fixed-overhead suspects behind the
  * persisted-index probe paths (r20 task 1) — what one tiny Spark
  * job, one 1-row meta read, one small localCheckpoint, one
  * readLive listing actually cost on this host, warm.
  *
  * Usage: runMain graft.ProfMicro <sfDir>
  */
object ProfMicro {
  private def time[T](label: String, n: Int = 3)(body: => T): Unit = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e3
    }
    println(f"$label%-46s ${ts.min / 1e3}%8.1f ms min of ${ts.map(t => f"${t / 1e3}%.0f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    System.setProperty("graft.gate.memo", "1")
    val sfDir = args.head
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-profmicro")
    import spark.implicits._

    // warm up
    spark.range(100).agg(sum("id")).collect()

    // build one bm25 index via the registered query (memoized path)
    SparkEntry.queries("x_bm25_index")(spark, sfDir).count()

    time("empty job: range(1).count", 10)(spark.range(1).count())
    time("raw RDD 1-task count", 10)(
      spark.sparkContext.parallelize(Seq(1), 1).count())
    time("raw RDD 32-task count", 10)(
      spark.sparkContext.parallelize(1 to 32, 32).count())
    time("2-stage RDD job (shuffle)", 10)(
      spark.sparkContext.parallelize(1 to 32, 4).map(x => (x % 3, x)).reduceByKey(_ + _).count())
    time("32-part job: range(1e6,32).sum", 10)(
      spark.range(0, 1000000, 1, 32).agg(sum("id")).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("empty job AQE OFF: range(1).count", 10)(spark.range(1).count())
    time("32-part AQE OFF: range(1e6,32).sum", 10)(
      spark.range(0, 1000000, 1, 32).agg(sum("id")).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    val docs = GraftSession.table(spark, sfDir, "documents")
    time("docs.parquet footer+schema (fresh reader)")(
      spark.read.parquet(s"$sfDir/documents.parquet").schema)

    // find the memoized bm25 index path
    val gate = GraftSession.gatePath("bm25idx", sfDir)
    println(s"index path: $gate")
    time("meta 1-row read+collect (spark)")(
      spark.read.parquet(s"$gate/meta").collect())
    time("meta schema only (spark)")(
      spark.read.parquet(s"$gate/meta").schema)

    time("tiny localCheckpoint (no exchange)")(
      docs.limit(50).select(col("doc_id")).localCheckpoint())
    time("small localCheckpoint (1 groupBy exchange)")(
      docs.groupBy(pmod(col("doc_id"), lit(7))).count().localCheckpoint())

    time("readLive listing walk (canon-ish dir)")(
      graft.ops.Scale.readLive(spark, s"$gate/meta").schema)

    val inc = docs.limit(200)
    time("Hints.isSmall (optimizer stats)")(
      graft.ops.Hints.isSmall(inc.groupBy("doc_id").count()))
    time("ensureWidth planning (df.rdd partitions)")(
      graft.ops.Scale.ensureWidth(docs.select(col("doc_id"), col("text"))))

    spark.stop()
  }
}
