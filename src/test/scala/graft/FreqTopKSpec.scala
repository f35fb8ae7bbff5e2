package graft

import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate: exactness inside the k ≥
  * distinct envelope, partition-layout invariance (the map-side merge
  * path), and the frequent-items error contract on the lossy path —
  * the part no SQL oracle can replay (order-dependent decrements).
  */
class FreqTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def tops(rows: Seq[String], k: Int, parts: Int): Seq[(String, Long)] =
    rows.toDF("s").repartition(parts)
      .agg(expr(s"freq_topk(s, $k)").as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.item"), col("p.cnt"))
      .as[(String, Long)].collect().toSeq

  test("exact inside the envelope (k >= distinct), sorted (cnt desc, item asc)") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    assert(tops(rows, k = 16, parts = 4) ===
      Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L)))
  }

  test("partition-layout invariant in the envelope (merge ≡ single pass)") {
    val rnd  = new scala.util.Random(11)
    val rows = Seq.fill(5000)(s"k${rnd.nextInt(200)}")
    assert(tops(rows, k = 512, parts = 1) === tops(rows, k = 512, parts = 32))
  }

  test("lossy path honors the MG contract: undercount <= N/(k+1), heavy items present") {
    val rnd = new scala.util.Random(7)
    // zipfish: item i appears ~ 4000/i times
    val rows  = (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"it$i")) ++
      Seq.fill(2000)(s"noise${rnd.nextInt(1000)}")
    val n     = rows.length.toLong
    val k     = 24
    val bound = n / (k + 1)
    val truth = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (parts <- Seq(1, 16)) {
      val got = tops(rnd.shuffle(rows), k, parts).toMap
      assert(got.size <= k)
      got.foreach { case (item, cnt) =>
        val t = truth(item)
        assert(cnt <= t, s"$item overcounted: $cnt > $t")
        assert(t - cnt <= bound, s"$item undercounted past N/(k+1): $cnt vs $t (bound $bound)")
      }
      truth.filter(_._2 > bound).keys.foreach { heavy =>
        assert(got.contains(heavy), s"heavy item $heavy (true ${truth(heavy)} > $bound) missing")
      }
    }
  }

  test("rejects non-string input at analysis and non-literal k with a named error") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").agg(expr("freq_topk(n, 8)")).queryExecution.analyzed
    }
    assert(err.getMessage.toLowerCase.contains("freq_topk"))
    val err2 = intercept[Exception] {
      Seq(("a", 4)).toDF("s", "k").agg(expr("freq_topk(s, k)")).queryExecution.analyzed
    }
    assert(err2.getMessage.contains("freq_topk"))
  }
}
