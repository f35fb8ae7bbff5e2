package graft

import graft.ops.Scale

import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpecBase {

  test("bucketed join on matching layouts runs without a shuffle") {
    val o = GraftSession.table(spark, sf, "orders")
    val c = GraftSession.table(spark, sf, "customer")
    Scale.writeBucketed(o.withColumnRenamed("o_custkey", "custkey"), "graft_b_orders", 8, Seq("custkey"))
    Scale.writeBucketed(c.withColumnRenamed("c_custkey", "custkey"), "graft_b_cust", 8, Seq("custkey"))
    // disable auto-broadcast so the join exercises the bucketed layout
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe       = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Scale.bucketedJoin(spark, "graft_b_orders", "graft_b_cust", Seq("custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() === o.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("ivfAssign shuffles nothing on the corpus side") {
    val e = GraftSession.table(spark, sf, "embeddings")
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val centroids = broadcast(c.orderBy(col("neighbor_id")).limit(4)
      .select(col("neighbor_id").as("cell_id"), col("cv").as("centroid")))
    val assigned = ops.Similarity.ivfAssign(c, centroids)
    val plan = assigned.queryExecution.executedPlan.toString
    // the only allowed Exchange is the SinglePartition one that folds
    // the (tiny) centroid set into its broadcast array — the corpus
    // path must be shuffle-free (no hashpartitioning anywhere)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus-side shuffle in ivfAssign:\n$plan")
    // every corpus row keeps exactly one cell, and it is the argmax cell
    assert(assigned.count() === c.count())
    val viaJoin = c.crossJoin(centroids)
      .withColumn("cdist", ops.Similarity.cosine(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cell_id"), struct(col("cdist"), -col("cell_id"))).as("cell_id"))
    val mismatches = assigned.select(col("neighbor_id"), col("cell_id"))
      .except(viaJoin.select(col("neighbor_id"), col("cell_id").cast("long")))
    assert(mismatches.count() === 0)
  }

  test("z-ordered layout prunes row groups for a 2-D box predicate; linear layout cannot") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    val z = Scale.writeZOrdered(ev, zdir, "user_id", "value", bits = 16, numFiles = 16)
    ev.repartition(16).write.mode("overwrite").parquet(ldir)
    val l = spark.read.parquet(ldir)
    def boxScanRows(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val q = df.filter(col("user_id").between(100, 160) && col("value").between(50, 80))
      val n = q.collect().length.toLong
      (n, fileScans(q.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum)
    }
    val (zN, zScanned) = boxScanRows(z)
    val (lN, lScanned) = boxScanRows(l)
    assert(zN === lN, "layouts must return identical rows")
    assert(zN > 0, "box must select something or the test is vacuous")
    // round-robin files span the full (user, value) range → their
    // row-group stats prune nothing
    assert(lScanned === ev.count(), s"linear layout unexpectedly pruned ($lScanned)")
    // the z-sorted files' min/max envelopes are tight in BOTH dims →
    // most row groups skip
    assert(zScanned * 2 < lScanned,
      s"z-order did not prune: scanned $zScanned of $lScanned")
  }

  test("zorderValue interleaves bits so 2-D proximity maps to value proximity") {
    import Scale.zorderValue
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L)).toDF("a", "b")
    val zs = df.select(zorderValue(col("a"), col("b"), 0, 3, 0, 3, bits = 2).as("z"))
      .as[Long].collect().toSeq
    // grid (a,b) scaled to [0,3]: morton codes 0,1,2,15
    assert(zs === Seq(0L, 1L, 2L, 15L))
  }

  test("profileTable: ONE scan; approx flavor plans a single Exchange and tracks exact") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    def exchanges(p: SparkPlan): Seq[Exchange] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case s: QueryStageExec        => exchanges(s.plan)
      case e: Exchange              => e +: e.children.flatMap(exchanges)
      case other                    => other.children.flatMap(exchanges)
    }
    val t = GraftSession.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

    val exact = Scale.profileTable(t)
    exact.collect()
    assert(fileScans(exact.queryExecution.executedPlan).length === 1,
      "exact profile must read the table once, not once per column")

    val approx = Scale.profileTable(t, approx = true)
    val approxRows = approx.collect()
    assert(fileScans(approx.queryExecution.executedPlan).length === 1)
    assert(exchanges(approx.queryExecution.executedPlan).length === 1,
      "approx profile must be scan -> partial agg -> ONE Exchange -> final agg")

    // approx agrees exactly on everything but n_distinct, which lands
    // within HLL++'s default 5% relative error
    val exactBy = exact.collect().map(r => r.getString(0) -> r).toMap
    approxRows.foreach { r =>
      val e = exactBy(r.getString(0))
      assert(r.getLong(1) === e.getLong(1) && r.getLong(2) === e.getLong(2))
      assert(r.getString(4) === e.getString(4) && r.getString(5) === e.getString(5))
      val (ad, ed) = (r.getLong(3).toDouble, e.getLong(3).toDouble)
      assert(math.abs(ad - ed) <= math.max(2.0, ed * 0.1),
        s"${r.getString(0)}: approx distinct $ad vs exact $ed")
    }
  }

  test("compact bin-packs small files per partition dir, preserving rows exactly") {
    val src = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val wh = java.nio.file.Files.createTempDirectory("compact-spec").toString
    src.repartition(16).write.mode("overwrite").partitionBy("lang").parquet(wh)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def langFiles(lang: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(wh, s"lang=$lang"))
        .count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
    val langs  = src.select("lang").distinct().collect().map(_.getString(0))
    val before = langs.map(l => l -> langFiles(l)).toMap
    assert(before.values.exists(_ > 4), "fixture must start fragmented")

    val stats = Scale.compact(spark, wh, targetBytes = 1L << 30)

    // every fragmented dir got packed to ONE file (target >> bytes)
    assert(stats.nonEmpty)
    stats.foreach { st =>
      assert(st.filesAfter === 1, s"${st.dir}: ${st.filesAfter}")
      assert(st.filesBefore > 1)
    }
    langs.foreach(l => assert(langFiles(l) === 1, s"lang=$l"))
    // rows identical, partition column re-derived from dir names
    val back = spark.read.parquet(wh)
    assert(back.count() === src.count())
    val a = src.select("doc_id", "lang", "n_chars").collect().map(_.toString).sorted
    val b = back.select("doc_id", "lang", "n_chars").collect().map(_.toString).sorted
    assert(a === b)

    // idempotent: a second pass finds nothing under-sized
    assert(Scale.compact(spark, wh, targetBytes = 1L << 30).isEmpty)
  }

  test("compact submits per-dir jobs concurrently from the bounded pool (32 dirs)") {
    // 32 fragmented partition dirs — the shape where the old serial
    // driver loop was the bottleneck
    val src = spark.range(0, 3200)
      .select(col("id"), pmod(col("id"), lit(32)).as("p"),
        (col("id") * 7).as("val"))
    val wh = java.nio.file.Files.createTempDirectory("compact-par-spec").toString
    src.repartition(6).write.mode("overwrite").partitionBy("p").parquet(wh)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // concurrency proof via the scheduler, not wall-clock: count the
    // max number of simultaneously-active jobs the pool achieved
    val active    = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val a = active.incrementAndGet()
        maxActive.updateAndGet(m => math.max(m, a)): Unit
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        active.decrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    val stats =
      try Scale.compact(spark, wh, targetBytes = 1L << 30, parallelism = 8)
      finally spark.sparkContext.removeSparkListener(listener)

    assert(stats.length === 32, s"all 32 fragmented dirs compact: $stats")
    assert(maxActive.get >= 2,
      s"expected overlapping per-dir jobs from the pool, saw max ${maxActive.get}")
    // swap protocol held per dir: compact-* files only, no tmp leftovers
    stats.foreach { st =>
      val dir   = new org.apache.hadoop.fs.Path(st.dir)
      val names = fs.listStatus(dir).map(_.getPath.getName)
      assert(names.count(_.startsWith("compact-")) === st.filesAfter)
      assert(!names.contains("_compact_tmp"), s"tmp dir leaked in ${st.dir}")
    }
    // rows identical after the concurrent swap
    val back = spark.read.parquet(wh)
    assert(back.select("id", "p", "val").collect().map(_.toString).sorted
      === src.collect().map(_.toString).sorted)
    assert(Scale.compact(spark, wh, targetBytes = 1L << 30, parallelism = 8).isEmpty)
  }

  test("compact packs loose files in a MIXED dir without touching child partitions") {
    val wh = java.nio.file.Files.createTempDirectory("compact-mixed-spec").toString
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // loose data files at the root ALONGSIDE a partition subdir — not
    // strict Hive, but compact must account for both, not skip either
    val loose = spark.range(0, 300).select(col("id"), (col("id") * 3).as("val"))
    loose.repartition(5).write.mode("overwrite").parquet(wh)
    fs.delete(new org.apache.hadoop.fs.Path(wh, "_SUCCESS"), false)
    val child    = spark.range(1000, 1300).select(col("id"), (col("id") * 3).as("val"))
    val childDir = s"$wh/p=1"
    child.repartition(5).write.mode("overwrite").parquet(childDir)
    fs.delete(new org.apache.hadoop.fs.Path(childDir, "_SUCCESS"), false)

    val stats = Scale.compact(spark, wh, targetBytes = 1L << 30)
    assert(stats.map(_.dir).toSet ===
      Set(wh, childDir).map(d =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(d)).toString),
      s"both the mixed root and the child compact: $stats")
    // per-dir contents preserved exactly (explicit file-list reads, so
    // the mixed root's rewrite never absorbed the child's rows)
    def rowsOf(d: String): Array[String] = {
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).toSeq
      spark.read.parquet(files: _*).select("id", "val").collect().map(_.toString).sorted
    }
    assert(rowsOf(wh) === loose.collect().map(_.toString).sorted)
    assert(rowsOf(childDir) === child.collect().map(_.toString).sorted)
  }

  test("salted join equals the plain join") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"))
    val supp = GraftSession.table(spark, sf, "supplier").select(col("s_suppkey"), col("s_name"))
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain  = li.join(supp, Seq("l_suppkey"))
    val salted = Scale.saltedJoin(li, supp, "l_suppkey", saltFactor = 4, saltSource = "l_orderkey")
    assert(salted.count() === plain.count())
    val a = plain.select("l_orderkey", "l_linenumber", "s_name").collect().map(_.toString).sorted
    val b = salted.select("l_orderkey", "l_linenumber", "s_name").collect().map(_.toString).sorted
    assert(a === b)
  }

  test("ensureWidth: widens fat-split frames, passes wide and streaming frames through") {
    import org.apache.spark.sql.functions._
    val want = spark.sparkContext.defaultParallelism
    // a narrow frame (1 partition) widens to session parallelism,
    // values untouched
    val narrow = spark.range(0, 1000, 1, 1).toDF("id")
    val widened = Scale.ensureWidth(narrow)
    assert(widened.rdd.getNumPartitions === want)
    assert(widened.agg(sum(col("id"))).head.getLong(0) === 499500L)
    // an already-wide frame passes through with its plan unchanged
    val wide = spark.range(0, 1000, 1, want).toDF("id")
    assert(Scale.ensureWidth(wide) eq wide)
    // the boundary, pinned INTENTIONALLY (r18 verdict): exactly half
    // the session parallelism passes through — the guard fires only
    // when the CPU-starvation ceiling is strictly worse than 2×
    if (want % 2 == 0 && want >= 2) {
      val half = spark.range(0, 1000, 1, want / 2).toDF("id")
      assert(Scale.ensureWidth(half) eq half,
        "exactly-half width is a bounded 2x ceiling: pass through, don't exchange")
    }
    // one below half (for even want) widens
    if (want % 2 == 0 && want >= 4) {
      val below = spark.range(0, 1000, 1, want / 2 - 1).toDF("id")
      assert(Scale.ensureWidth(below).rdd.getNumPartitions === want)
    }
    // a STREAMING frame passes through unchanged (partition
    // introspection would throw on it) — the probes' stream-static
    // branches call ensureWidth unconditionally
    val dir = java.nio.file.Files.createTempDirectory("widthstream").toString
    narrow.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(narrow.schema).parquet(dir)
    assert(Scale.ensureWidth(stream) eq stream)
  }
}
