package graft

import graft.ops.{Dedup, Temporal}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics + plan-shape specs for the temporal operator family
  * (as-of join, bucketed range join, moving window) and the
  * end-to-end dedup application.
  */
class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  // ----------------------------------------------------------- as-of join

  test("asofJoin: latest right row at or before each left ts, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 50L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 60L, 9.0))
      .toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, "k", "ts")
      .select("tag", "asof_ts", "asof_v").as[(String, Option[Long], Option[Double])]
      .collect().map { case (t, ts, v) => t -> ((ts, v)) }.toMap
    // ts=10 matches the right row AT 10 (inclusive <=)
    assert(out("a") == ((Some(10L), Some(1.0))))
    // ts=20 carries the latest (15), not the first
    assert(out("b") == ((Some(15L), Some(2.0))))
    // ts=5 precedes all right rows -> null
    assert(out("c") == ((None, None)))
    // key 2's only right row is later -> null (no cross-key leakage)
    assert(out("d") == ((None, None)))
  }

  test("asofJoin forward + tolerance: earliest right at/after, nulled beyond the bound") {
    val left = Seq((1L, 10L, "a"), (1L, 16L, "b"), (1L, 100L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 15L, 1.0), (1L, 20L, 2.0)).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, "k", "ts",
        direction = "forward", tolerance = Some(10L))
      .select("tag", "asof_ts", "asof_v").as[(String, Option[Long], Option[Double])]
      .collect().map { case (t, ts, v) => t -> ((ts, v)) }.toMap
    // ts=10 → earliest at/after is 15 (within tol 10)
    assert(out("a") == ((Some(15L), Some(1.0))))
    // ts=16 → next is 20, not the earlier 15 (forward only)
    assert(out("b") == ((Some(20L), Some(2.0))))
    // ts=100 → nothing after; and backward matches don't leak
    assert(out("c") == ((None, None)))
    // tolerance kills only matches beyond the bound (a: gap 5 > 4
    // nulled; b: gap 4 ≤ 4 kept)
    val tight = Temporal.asofJoin(left, right, "k", "ts",
        direction = "forward", tolerance = Some(4L))
      .select("tag", "asof_ts").as[(String, Option[Long])].collect().toMap
    assert(tight("a").isEmpty && tight("b").contains(20L))
  }

  test("asofJoin ≡ brute force on randomized series (both directions, seeded)") {
    val rnd = new scala.util.Random(99)
    val left = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(200).toLong))
    // unique (key, ts) on the right, as the operator contract requires
    val right = rnd.shuffle((0L until 5L).flatMap(k =>
      rnd.shuffle((0L until 200L).toVector).take(30).map(t => (k, t, rnd.nextDouble()))))
    val lDf = left.toDF("id", "k", "ts")
    val rDf = right.toDF("k", "ts", "v")
    for (dir <- Seq("backward", "forward")) {
      val got = Temporal.asofJoin(lDf, rDf, "k", "ts", direction = dir)
        .select("id", "asof_ts").as[(Long, Option[Long])].collect().toMap
      left.foreach { case (id, k, ts) =>
        val cands = right.filter(r => r._1 == k &&
          (if (dir == "backward") r._2 <= ts else r._2 >= ts)).map(_._2)
        val expected =
          if (cands.isEmpty) None
          else Some(if (dir == "backward") cands.max else cands.min)
        assert(got(id) == expected, s"dir=$dir id=$id k=$k ts=$ts")
      }
    }
  }

  test("asofJoin plans one exchange, never a join") {
    val left  = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "ts", "v")
    val plan = Temporal.asofJoin(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be union+window, not a join:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 key exchange, got $exchanges:\n$plan")
  }

  // ------------------------------------------------------------ range join

  test("rangeJoin: exact containment, no duplicate pairs across buckets") {
    // interval B spans 3 buckets (width 10); point 25 falls in its
    // middle bucket — the pair must appear exactly once
    val iv = Seq(("A", 0L, 4L), ("B", 8L, 29L), ("C", 40L, 41L))
      .toDF("iv_id", "lo", "hi")
    val pts = Seq(3L, 8L, 25L, 29L, 30L, 39L).toDF("p")
    val out = Temporal.rangeJoin(iv, pts, "lo", "hi", "p", bucketWidth = 10L)
      .select("iv_id", "p").as[(String, Long)].collect().sorted
    assert(out.toSeq == Seq(("A", 3L), ("B", 8L), ("B", 25L), ("B", 29L)))
  }

  test("rangeJoin plans an equi-join on the bucket, never a nested loop") {
    val iv  = Seq(("A", 0L, 4L)).toDF("iv_id", "lo", "hi")
    val pts = Seq(3L).toDF("p")
    val plan = Temporal.rangeJoin(iv, pts, "lo", "hi", "p", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join degraded to a nested loop:\n$plan")
  }

  test("rangeJoin ≡ brute force on randomized intervals (seeded)") {
    val rnd = new scala.util.Random(321)
    for (round <- 1 to 3) {
      val ivs = (1 to 40).map { i =>
        val lo = rnd.nextInt(500).toLong
        (i.toLong, lo, lo + rnd.nextInt(60).toLong)
      }
      val pts = (1 to 120).map(_ => rnd.nextInt(560).toLong).distinct
      val got = Temporal.rangeJoin(
          ivs.toDF("iv_id", "lo", "hi"), pts.toDF("p"), "lo", "hi", "p",
          bucketWidth = 1 + rnd.nextInt(80).toLong)
        .select("iv_id", "p").as[(Long, Long)].collect().sorted.toSeq
      val expected = (for {
        (id, lo, hi) <- ivs; p <- pts if p >= lo && p <= hi
      } yield (id, p)).sorted
      assert(got == expected, s"round $round diverged (width-dependent bug)")
    }
  }

  test("overlapJoin ≡ brute force, emits each pair EXACTLY once (any bucket width)") {
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 3) {
      val as = (1 to 40).map { i =>
        val lo = rnd.nextInt(400).toLong; (i.toLong, lo, lo + rnd.nextInt(80).toLong)
      }
      val bs = (1 to 40).map { i =>
        val lo = rnd.nextInt(400).toLong; (i.toLong, lo, lo + rnd.nextInt(80).toLong)
      }
      // width 1..6 makes most intervals span MANY buckets — the
      // emit-once owner rule is what keeps pairs unique here
      val got = Temporal.overlapJoin(
          as.toDF("a_id", "a_lo", "a_hi"), bs.toDF("b_id", "b_lo", "b_hi"),
          "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 1 + rnd.nextInt(6).toLong)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val expected = (for {
        (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
        if math.max(alo, blo) <= math.min(ahi, bhi)
      } yield (ai, bi)).sorted
      assert(got.sorted == expected, s"round $round diverged")
      assert(got.distinct.size == got.size, s"round $round emitted duplicates")
    }
  }

  test("overlapJoin plans an equi-join on the bucket, never a nested loop") {
    val a = Seq((1L, 0L, 4L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 3L, 9L)).toDF("b_id", "b_lo", "b_hi")
    val plan = Temporal.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"overlap join degraded to a nested loop:\n$plan")
  }

  test("gapFill ≡ brute force on randomized series (seeded)") {
    val rnd = new scala.util.Random(77)
    val events = (1 to 200).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(300).toLong, rnd.nextInt(100).toDouble))
    val step = 25L
    val got = Temporal.gapFill(events.toDF("k", "ts", "v"), "k", "ts", "v", step)
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    val expected = events.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      val byBucket = es.groupBy(e => e._2 / step * step).view.mapValues(_.map(_._3).max).toMap
      val (lo, hi) = (byBucket.keys.min, byBucket.keys.max)
      var lastV = 0.0
      (lo to hi by step).map { b =>
        val obs = byBucket.get(b)
        obs.foreach(lastV = _)
        (k, b, lastV, if (obs.isDefined) 1 else 0)
      }
    }.sorted
    assert(got == expected)
  }

  // --------------------------------------------------------- moving window

  test("movingWindow: RANGE frame includes ts peers; gap tie-broken") {
    val e = Seq(
      (1L, 1L, 100L, 10.0), // user 1: two events at the SAME ts
      (2L, 1L, 100L, 20.0),
      (3L, 1L, 150L, 1.0),  // inside the 100-unit window of both
      (4L, 1L, 300L, 5.0)   // only itself in range [200, 300]
    ).toDF("event_id", "user_id", "us", "value")
    val out = Temporal.movingWindow(e, "user_id", "us", "event_id", "value", rangeBack = 100L)
      .select("event_id", "gap", "n_window", "sum_window")
      .as[(Long, Option[Long], Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // RANGE peers: both ts=100 rows see each other (n=2, sum=30)
    assert(out(1L) == ((None, 2L, 30.0)))
    assert(out(2L) == ((Some(0L), 2L, 30.0)))
    // ts=150 window [50,150] holds all three
    assert(out(3L) == ((Some(50L), 3L, 31.0)))
    // ts=300 window [200,300] holds only itself
    assert(out(4L) == ((Some(150L), 1L, 5.0)))
  }

  test("movingWindow plans a single exchange+sort for both frames") {
    val e = Seq((1L, 1L, 100L, 1.0)).toDF("event_id", "user_id", "us", "value")
    val plan = Temporal.movingWindow(e, "user_id", "us", "event_id", "value", 100L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"lag + RANGE frames should share one exchange:\n$plan")
  }

  // ------------------------------------------------- dedup application

  test("applyDedup: chains collapse to the min-id survivor; singletons keep n_merged=1") {
    val corpus = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "y"))
      .toDF("id", "text")
    // chain 1~2, 2~3 => component {1,2,3}, survivor 1 with n_merged 3
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.applyDedup(corpus, "id", pairs)
      .select("id", "n_merged").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 3L), (9L, 1L)))
  }

  // --------------------------------------------------------- gap fill

  test("gapFill materializes missing buckets and forward-fills") {
    val e = Seq(
      (1L, 5L, 10.0),   // bucket 0
      (1L, 35L, 20.0),  // bucket 30 — bucket 10/20 are gaps
      (2L, 12L, 7.0)    // single bucket, no grid beyond itself
    ).toDF("user_id", "us", "value")
    val out = Temporal.gapFill(e, "user_id", "us", "value", step = 10L)
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 0L, 10.0, 1),
      (1L, 10L, 10.0, 0), // gap, carried forward
      (1L, 20L, 10.0, 0), // gap, carried forward
      (1L, 30L, 20.0, 1),
      (2L, 10L, 7.0, 1)))
  }

  test("gapFill buckets by integral division at epoch-nano magnitudes (no double floor)") {
    // 2^62-1 rounds UP to 2^62 as a double, so floor(ts/step) computed in
    // double space lands the point one bucket too late (bucket start
    // AFTER the point). Integral div must place it correctly.
    val step = 1000L
    val ts   = (1L << 62) - 1       // 4611686018427387903
    assert(math.floor(ts.toDouble / step).toLong * step > ts,
      "precondition: this magnitude must actually break double floor-div")
    val out = Temporal.gapFill(
      Seq((1L, ts, 5.0)).toDF("k", "ns", "v"), "k", "ns", "v", step)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out == Seq((1L, ts / step * step, 5.0, 1)))
  }

  test("gapFill floors (not truncates) negative pre-1970 timestamps") {
    // div truncates toward zero: ts=-500, step=1000 would land in
    // bucket 0, whose START (0) is after the observation. True floor
    // places it at -1000; the grid then spans [-1000, 1000].
    val out = Temporal.gapFill(
      Seq((1L, -500L, 1.0), (1L, 1500L, 2.0)).toDF("k", "ts", "v"),
      "k", "ts", "v", step = 1000L)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (1L, -1000L, 1.0, 1), (1L, 0L, 1.0, 0), (1L, 1000L, 2.0, 1)))
  }

  // ---------------------------------------------- stream-static enrich

  test("streamEnrichedCounts equals the batch enrichment (stream-static broadcast join)") {
    import graft.streaming.EventsStream
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val nation = GraftSession.table(spark, sf, "nation")
    val q = EventsStream.streamEnrichedCounts(spark, sf, schema, "enrich_spec", nation,
      globFilter = Some("events.parquet"))
    q.awaitTermination()
    val streamed = spark.table("enrich_spec").orderBy("n_name").collect().toSeq
    val batch = EventsStream.enrichedCounts(
      spark.read.parquet(s"$sf/events.parquet"), nation).orderBy("n_name").collect().toSeq
    assert(streamed == batch)
  }

  // --------------------------------------- approx percentile scale path

  test("approx_percentile tracks exact percentile within the accuracy bound") {
    // the oracle-gated x_percentiles is exact (full sort per group);
    // at 100 TB the same question is answered by approx_percentile
    // (map-side-combinable sketch). Check the sketch at accuracy
    // 10000 stays within 1% of exact on the real sf table.
    val li = GraftSession.table(spark, sf, "lineitem")
    val both = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"))
    both.collect().foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(e - a) / e < 0.01, s"approx median off: exact=$e approx=$a")
    }
  }
}
