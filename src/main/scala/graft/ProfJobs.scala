package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: per-JOB wall-clock breakdown of one registered query —
  * where the optimization guide's "measure first" rule meets the
  * per-probe fixed-overhead hunt (r19 verdict task 1). Prints every
  * Spark job the query construction + count runs (start offset,
  * duration, call site), so driver-side GAPS between jobs (planning,
  * file listing, FS metadata work) are visible as missing wall time.
  *
  * Usage: runMain graft.ProfJobs <sfDir> <query> [query...]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.gate.memo", "1")
    val sfDir = args.head
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-profjobs")

    @volatile var t0 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines  = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(x => Option(x.getProperty("callSite.short")))
          .orElse(p.flatMap(x => Option(x.getProperty("spark.job.description"))))
          .orElse(p.flatMap(x => Option(x.getProperty("spark.sql.execution.root.id")).map("sqlRoot=" + _)))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (s, site) =>
          val now = System.nanoTime()
          lines.add(f"  job ${je.jobId}%3d  +${(s - t0) / 1e9}%6.2fs  ${(now - s) / 1e9}%6.3fs  $site")
        }
      }
    })

    // streaming rows: print each micro-batch's phase durations
    // (addBatch/getBatch/latestOffset/queryPlanning/walCommit/
    // commitOffsets) so the per-trigger fixed cost decomposes
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        lines.add(f"  stream start +${(System.nanoTime() - t0) / 1e9}%6.2fs ${e.name}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs
        lines.add(f"  batch ${e.progress.batchId}  +${(System.nanoTime() - t0) / 1e9}%6.2fs  " +
          s"durations=$d rows=${e.progress.numInputRows}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        lines.add(f"  stream end   +${(System.nanoTime() - t0) / 1e9}%6.2fs")
    })

    args.tail.foreach { name =>
      (1 to 2).foreach { run =>
        lines.clear()
        t0 = System.nanoTime()
        val fn = SparkEntry.queries(name)
        val df = fn(spark, sfDir)
        val tBuilt = System.nanoTime()
        val n = df.count()
        val tDone = System.nanoTime()
        // drain listener events before printing (private bus — a
        // short sleep is fine for a dev tool)
        Thread.sleep(300)
        println(s"==== $name run $run: $n rows " +
          f"construct=${(tBuilt - t0) / 1e9}%.2fs count=${(tDone - tBuilt) / 1e9}%.2fs total=${(tDone - t0) / 1e9}%.2fs")
        lines.forEach(l => println(l))
      }
    }
    spark.stop()
  }
}
