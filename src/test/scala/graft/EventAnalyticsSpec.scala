package graft

import graft.ops.EventAnalytics

import org.apache.spark.sql.functions._

/** Funnel fold semantics (earliest chain, strict ordering, window
  * gate) and cohort-matrix bucketing.
  */
class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")
  private val W     = 100L // window, in the test's fake µs domain

  private def depths(rows: Seq[(Long, String, Long)]): Map[Long, Int] =
    EventAnalytics.funnelDepth(
      rows.toDF("user_id", "event_type", "us"), "user_id", "event_type", "us", Steps, W)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("funnel: chain depth, broken order, window overrun, depth-0") {
    val d = depths(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full chain
      (2L, "click", 10L), (2L, "view", 20L), (2L, "purchase", 30L), // click precedes view: no step-2 after t1
      (3L, "view", 10L), (3L, "click", 200L),                       // click outside window
      (4L, "click", 10L), (4L, "purchase", 20L),                    // no view at all
      (5L, "view", 10L), (5L, "view", 40L), (5L, "click", 120L)     // earliest view anchors: 120-10 > W even though 120-40 ≤ W
    ))
    assert(d(1L) === 3)
    assert(d(2L) === 1, "steps out of order must not chain")
    assert(d(3L) === 1, "window overrun must not advance")
    assert(d(4L) === 0, "funnel events but no step-1: depth 0")
    assert(d(5L) === 1, "the chain anchors at the EARLIEST step-1 event")
  }

  test("funnel: same-timestamp events cannot chain (strict ordering)") {
    val d = depths(Seq((1L, "view", 10L), (1L, "click", 10L), (1L, "purchase", 11L)))
    assert(d(1L) === 1, "a click at the view's own timestamp is not 'after' it")
  }

  test("funnel: null timestamps are skipped, not fold-wedging") {
    // a null-us view must not become t1=null (which nulls every later
    // comparison); SQL min() skips nulls, the operator must too
    val rows = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "view", null), (1L, "view", 10L), (1L, "click", 20L),
      (2L, "view", null), (2L, "click", 100L))
      .toDF("user_id", "event_type", "us")
    val d = EventAnalytics.funnelDepth(rows, "user_id", "event_type", "us", Steps, W)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(1L) === 2, "the non-null view anchors the chain")
    assert(d(2L) === 0, "only-null step-1 events leave the user at depth 0")
  }

  test("funnel fold ≡ brute-force min-chain on randomized event logs") {
    val rng  = new scala.util.Random(42)
    val evts = (1 to 2000).map { i =>
      (rng.nextInt(60).toLong,
        Seq("view", "click", "purchase", "error")(rng.nextInt(4)),
        rng.nextInt(300).toLong)
    }.distinct
    def brute(user: Seq[(String, Long)]): Int = {
      val t1 = user.collect { case ("view", t) => t }.sorted.headOption
      t1 match {
        case None => if (user.exists(e => Steps.contains(e._1))) 0 else -1
        case Some(a) =>
          val t2 = user.collect { case ("click", t) if t > a => t }.sorted.headOption
            .filter(_ - a <= W)
          val t3 = t2.flatMap(b => user.collect { case ("purchase", t) if t > b => t }
            .sorted.headOption.filter(_ - a <= W))
          if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
      }
    }
    val expected = evts.groupBy(_._1)
      .map { case (u, es) => u -> brute(es.map(e => (e._2, e._3))) }
      .filter(_._2 >= 0)
    val got = depths(evts)
    assert(got === expected)
  }

  test("funnelTiming: convert_us = completion minus anchor, null unless the chain finished") {
    val rows = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 75L), // dur 65
      (2L, "view", 10L), (2L, "click", 20L))                        // incomplete
      .toDF("user_id", "event_type", "us")
    val out = EventAnalytics.funnelTiming(rows, "user_id", "event_type", "us", Steps, W)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(out === Map(1L -> ((3, 65L)), 2L -> ((2, -1L))))
  }

  test("ewmaByKey: fixed-point recurrence, order by time, null/negative skip") {
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 30L, 10L), (1L, 10L, 4L), (1L, 20L, 6L), // out-of-order input
      (2L, 10L, 8L), (2L, null, 99L), (2L, 20L, -5L)) // null ts + negative skipped
      .toDF("user_id", "us", "cents")
    val out = graft.ops.EventAnalytics.ewmaByKey(rows, "user_id", "us", "cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 1 sorted values 4,6,10: 4000 → (4000+6000)/2=5000 → (5000+10000)/2=7500
    assert(out === Map(1L -> 7500L, 2L -> 8000L))
  }

  test("skew guard: a pathological hot user degrades loudly, not with an OOM") {
    // user 1 is the bot: 40 views THEN the click+purchase land beyond
    // the cap — uncapped the chain completes (depth 3); capped at 10
    // only the earliest views survive, so depth 1 + the raised flag
    val hot = (0 until 40).map(i => (1L, "view", 10L + i)) ++
      Seq((1L, "click", 60L), (1L, "purchase", 70L))
    val normal = Seq((2L, "view", 10L), (2L, "click", 20L), (2L, "purchase", 30L))
    val rows = (hot ++ normal).toDF("user_id", "event_type", "us")
    def run(cap: Int): Map[Long, (Int, Boolean)] =
      EventAnalytics.funnelDepth(rows, "user_id", "event_type", "us", Steps, W,
          maxEventsPerKey = cap)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(run(Int.MaxValue) === Map(1L -> ((3, false)), 2L -> ((3, false))))
    val capped = run(10)
    assert(capped(1L) === ((1, true)),
      "hot user: result from the 10 EARLIEST events, flag raised")
    assert(capped(2L) === ((3, false)), "normal users are untouched by the guard")
  }

  test("skew guard: ewma folds the earliest-cap prefix and flags the key") {
    val rows = Seq((1L, 10L, 4L), (1L, 20L, 6L), (1L, 30L, 10L), (2L, 10L, 8L))
      .toDF("user_id", "us", "cents")
    val out = EventAnalytics.ewmaByKey(rows, "user_id", "us", "cents",
        maxEventsPerKey = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // user 1 capped to (4, 6): 4000 → (4000+6000)/2 = 5000, flagged
    assert(out === Map(1L -> ((5000L, true)), 2L -> ((8000L, false))))
  }

  test("skew guard: capped funnel plans ONE exchange (window rides the fold's shuffle)") {
    val rows = Seq((1L, "view", 10L)).toDF("user_id", "event_type", "us")
    val df = EventAnalytics.funnelDepth(rows, "user_id", "event_type", "us", Steps, W,
      maxEventsPerKey = 10)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"row_number guard must not add a shuffle:\n$plan")
  }

  test("retention cohorts: hand matrix") {
    val Week = 7L * 86400L * 1000000L
    val rows = Seq(
      (1L, "signup", 0L * Week + 5L), (1L, "click", 1L * Week + 1L), (1L, "view", 2L * Week),
      (2L, "signup", 0L * Week + 9L), (2L, "view", 0L * Week + 10L),
      (3L, "signup", 1L * Week), (3L, "click", 3L * Week),
      (4L, "click", 0L)) // never signs up: absent
    val out = EventAnalytics.retentionCohorts(
      rows.toDF("user_id", "event_type", "us"), "user_id", "event_type", "us", "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, // both cohort-0 users active in week 0 (the signup itself)
      (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }
}
