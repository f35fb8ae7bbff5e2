package graft

/** Dev tool: print the formatted physical plan and timing for one or
  * more registered queries. Usage:
  *   runMain graft.Explain <sfDir> <query> [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // measure like Bench: persisted-index gate rows reuse the per-JVM
    // build memo so the timed window is the probe, not the build
    // (explicit -Dgraft.gate.fresh=1 still wins — see QueriesScale)
    System.setProperty("graft.gate.memo", "1")
    val sfDir = args.head
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-explain")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
      // time like Bench does — construction INCLUDED (eager driver
      // actions inside a query body are part of its cost; the old
      // timer started after fn() and undercounted exactly the rows
      // whose cost is construction-side), best-of-2 over fresh
      // invocations
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n  = SparkEntry.queries(name)(spark, sfDir).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val n = times.head._1
      // run-to-run row-count drift is exactly the nondeterminism this
      // tool exists to surface (r19 ADVICE) — print it loudly instead
      // of silently reporting run 1's count
      if (times.map(_._1).distinct.size != 1)
        println(s"==== $name: ROW-COUNT DRIFT across runs: ${times.map(_._1).mkString(", ")}")
      println(f"==== $name: $n rows in ${times.map(_._2).min}%.2f s " +
        f"(runs: ${times.map(t => f"${t._2}%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
