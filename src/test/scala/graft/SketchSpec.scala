package graft

import org.apache.spark.sql.functions._

/** KMV distinct-count sketch: exactness under k, estimator accuracy,
  * and partition-layout invariance (the map-side merge path).
  */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmv_distinct is exact below k (the set IS the distinct values)") {
    val df = (1 to 100).map(i => s"v${i % 40}").toDF("s")
    val est = df.agg(expr("kmv_distinct(s, 256)")).head.getDouble(0)
    assert(est == 40.0)
  }

  test("kmv_distinct estimates within the KMV error bound at k=256") {
    // 20000 distinct values, k=256: std err ≈ 1/√254 ≈ 6.3%; assert 3σ
    val df = (1 to 20000).map(i => s"item$i").toDF("s")
    val est = df.agg(expr("kmv_distinct(s, 256)")).head.getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.19, s"estimate $est too far from 20000")
  }

  test("kmv_distinct is partition-layout invariant (merge ≡ single pass)") {
    val vals = (1 to 5000).map(i => s"k${i * 7}")
    val one  = vals.toDF("s").repartition(1).agg(expr("kmv_distinct(s, 128)")).head.getDouble(0)
    val many = vals.toDF("s").repartition(16).agg(expr("kmv_distinct(s, 128)")).head.getDouble(0)
    assert(one == many, s"merge path diverged: $one vs $many")
  }

  test("kmv_distinct ignores duplicates and nulls") {
    val df = Seq("a", "a", "b", null, "b", "c").toDF("s")
    val est = df.agg(expr("kmv_distinct(s, 16)")).head.getDouble(0)
    assert(est == 3.0)
  }

  test("kmv_distinct rejects non-string input at ANALYSIS, not execution") {
    // the hash contract is md5(CAST(x AS VARCHAR)) with the cast
    // explicit; an un-cast bigint must fail analysis, not CCE at eval
    val df = Seq(1L, 2L, 3L).toDF("n")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(expr("kmv_distinct(n, 16)")).queryExecution.analyzed
    }
    assert(err.getMessage.toLowerCase.contains("kmv_distinct"))
  }

  test("kmv_distinct rejects a non-literal k with a named error") {
    val df = Seq(("a", 4)).toDF("s", "k")
    val err = intercept[Exception] {
      df.agg(expr("kmv_distinct(s, k)")).queryExecution.analyzed
    }
    assert(err.getMessage.contains("kmv_distinct"),
      s"expected a kmv_distinct-naming error, got: ${err.getMessage}")
  }

  test("kmv sketch algebra: union of part-sketches IS the sketch of the union") {
    import graft.ops.Sketches
    // the composability law the synopsis table relies on
    val left  = (1 to 3000).map(i => s"L$i")
    val right = (2000 to 5000).map(i => s"L$i") // overlap 2000..3000
    val skL = left.toDF("s").agg(expr("kmv_sketch(s, 64)")).head.getSeq[String](0)
    val skR = right.toDF("s").agg(expr("kmv_sketch(s, 64)")).head.getSeq[String](0)
    val skU = (left ++ right).toDF("s").agg(expr("kmv_sketch(s, 64)")).head.getSeq[String](0)
    val merged = Seq((skL, skR)).toDF("a", "b")
      .select(Sketches.unionSketch(col("a"), col("b"), 64)).head.getSeq[String](0)
    assert(merged == skU)
  }

  test("kmv sketch algebra: jaccard and intersection estimates track truth") {
    import graft.ops.Sketches
    val left  = (1 to 3000).map(i => s"v$i")
    val right = (2001 to 5000).map(i => s"v$i") // |∩| = 1000, |∪| = 5000, J = 0.2
    val df = Seq((
      left.toDF("s").agg(expr("kmv_sketch(s, 256)")).head.getSeq[String](0),
      right.toDF("s").agg(expr("kmv_sketch(s, 256)")).head.getSeq[String](0)
    )).toDF("a", "b")
    val row = df.select(
      Sketches.jaccardEst(col("a"), col("b"), 256).as("j"),
      Sketches.intersectEst(col("a"), col("b"), 256).as("i")).head
    assert(math.abs(row.getDouble(0) - 0.2) < 0.06, s"jaccard est ${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 1000.0) / 1000.0 < 0.3, s"intersect est ${row.getDouble(1)}")
  }

  test("kmv_quantile is the exact lower weighted quantile below k") {
    // 1..200 each with multiplicity = value (triangular multiset):
    // total = 20100, p50 boundary at cum ≥ 10050 → v = 141
    val df = (1 to 200).flatMap(v => Seq.fill(v)(v.toLong)).toDF("v")
    val est = df.agg(expr("kmv_quantile(v, 1024, 50)")).head.getLong(0)
    val exact = {
      val total = 20100L
      (1 to 200).map(_.toLong).scanLeft(0L)(_ + _).zipWithIndex
        .collectFirst { case (cum, i) if 100L * cum >= 50L * total => i.toLong }.get
    }
    assert(est == exact, s"exact-regime median $est != $exact")
  }

  test("kmv_quantile lossy regime matches a hand replay of the same estimator") {
    // 500 distinct values, k=32: sample = the 32 min-md5 values with
    // their counts; the lower weighted quantile of that sample is the
    // contract — recompute it directly
    val vals = (1 to 500).map(v => v.toLong -> (1L + v % 7)).toMap
    val rows = vals.toSeq.flatMap { case (v, n) => Seq.fill(n.toInt)(v) }
    val k = 32
    val sample = vals.keys.toSeq
      .sortBy(v => graft.functions.KmvDistinctAgg.md5Hex(v.toString.getBytes("US-ASCII")))
      .take(k).sorted
    val total = sample.map(vals).sum
    val expected = sample.zip(sample.map(vals).scanLeft(0L)(_ + _).tail)
      .collectFirst { case (v, cum) if 100L * cum >= 75L * total => v }.get
    val est = rows.toDF("v").agg(expr(s"kmv_quantile(v, $k, 75)")).head.getLong(0)
    assert(est == expected, s"lossy-regime p75 $est != replay $expected")
  }

  test("kmv_quantile is partition-layout invariant, even when lossy") {
    val rows = (1 to 4000).map(i => (i * 2654435761L) % 997L)
    val one  = rows.toDF("v").repartition(1).agg(expr("kmv_quantile(v, 64, 50)")).head.getLong(0)
    val many = rows.toDF("v").repartition(17).agg(expr("kmv_quantile(v, 64, 50)")).head.getLong(0)
    assert(one == many, s"merge path diverged: $one vs $many")
  }

  test("kmv_quantile rejects non-bigint input at analysis and skips nulls") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.5, 2.5).toDF("d").agg(expr("kmv_quantile(d, 16, 50)")).queryExecution.analyzed
    }
    assert(err.getMessage.toLowerCase.contains("kmv_quantile"))
    val est = Seq[java.lang.Long](5L, null, 7L, null, 9L).toDF("v")
      .agg(expr("kmv_quantile(v, 16, 50)")).head.getLong(0)
    assert(est == 7L)
  }

  test("kmv_quantile sketch algebra: merge(group sketches) ≡ direct sketch, even lossy") {
    // the law the synopsis-table workflow relies on: per-group string
    // synopses re-aggregate to exactly the single-pass global answer
    val df = (1 to 3000).map(i => ((i % 7).toString, ((i * 31) % 211).toLong)).toDF("g", "v")
    val merged = df.groupBy(col("g")).agg(expr("kmv_quantile_sketch(v, 32)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .agg(expr("kmv_quantile_merge(e, 32, 50)")).head.getLong(0)
    val direct = df.agg(expr("kmv_quantile(v, 32, 50)")).head.getLong(0)
    assert(merged == direct, s"merge path $merged != direct $direct")
  }

  test("kmv_quantile_merge skips malformed entries instead of failing the job") {
    // a public SQL function over arbitrary strings must degrade
    // per-entry; only the two well-formed entries count
    val h5 = graft.functions.KmvDistinctAgg.md5Hex("5".getBytes("US-ASCII"))
    val h9 = graft.functions.KmvDistinctAgg.md5Hex("9".getBytes("US-ASCII"))
    val df = Seq(s"$h5:5:3", "garbage", "a:b:c", "x:1", s"$h9:9:1", null)
      .toDF("e")
    val est = df.agg(expr("kmv_quantile_merge(e, 16, 50)")).head.getLong(0)
    assert(est === 5L) // cum 3 of 4 at v=5 crosses the median
  }

  test("kmv_distinct matches the closed-form estimator on a known set") {
    // recompute (k-1)/u_k by hand from the same md5 ordering
    val vals = (1 to 1000).map(_.toString)
    val k = 64
    val hashes = vals.map(v =>
      graft.functions.KmvDistinctAgg.md5Hex(v.getBytes("UTF-8"))).sorted
    val uk = java.lang.Long.parseLong(hashes(k - 1).substring(0, 12), 16).toDouble /
      graft.functions.KmvDistinctAgg.Denom
    val expected = (k - 1).toDouble / uk
    val est = vals.toDF("s").agg(expr(s"kmv_distinct(s, $k)")).head.getDouble(0)
    assert(est == expected)
  }

  // ---- Bloom filter laws (Sketches.bloomBuild/Merge/MaybeContains) ----

  test("bloom: no false negatives — every built value probes true") {
    import graft.ops.Sketches
    val vals = (1 to 2000).map(i => s"key$i").toDF("v")
    val sk = Sketches.bloomBuild(vals, "v", mBits = 1 << 14, kHash = 3)
    val probed = Sketches.bloomMaybeContains(sk, vals, "v", 1 << 14, 3)
    assert(probed.filter(!col("maybe")).count() === 0L)
  }

  test("bloom: false-positive rate is in the configured envelope") {
    import graft.ops.Sketches
    // n=2000, m=2^14, k=3 → theoretical fpr ≈ (1-e^{-kn/m})^k ≈ 2.7%
    val seen  = (1 to 2000).map(i => s"key$i").toDF("v")
    val other = (1 to 4000).map(i => s"absent$i").toDF("v")
    val sk = Sketches.bloomBuild(seen, "v", 1 << 14, 3)
    val fp = Sketches.bloomMaybeContains(sk, other, "v", 1 << 14, 3)
      .filter(col("maybe")).count()
    assert(fp.toDouble / 4000 < 0.08, s"fp rate ${fp / 4000.0} beyond 3x theory")
    assert(fp > 0, "planted sizing should produce SOME false positives")
  }

  test("bloom: merge of split builds ≡ one build over the union") {
    import graft.ops.Sketches
    val all = (1 to 3000).map(i => s"u$i")
    val (a, b) = all.splitAt(1300)
    val merged = Sketches.bloomMerge(
      Sketches.bloomBuild(a.toDF("v"), "v", 4096, 4),
      Sketches.bloomBuild(b.toDF("v"), "v", 4096, 4))
    val direct = Sketches.bloomBuild(all.toDF("v"), "v", 4096, 4)
    assert(merged.exceptAll(direct).count() === 0L &&
      direct.exceptAll(merged).count() === 0L, "merged word set diverged from direct build")
  }

  test("bloom: build is partition-layout invariant and duplicate-blind") {
    import graft.ops.Sketches
    val vals = (1 to 500).map(i => s"d${i % 200}")
    val one  = Sketches.bloomBuild(vals.toDF("v").repartition(1), "v", 2048, 3)
    val many = Sketches.bloomBuild(vals.toDF("v").repartition(16), "v", 2048, 3)
    assert(one.exceptAll(many).count() === 0L && many.exceptAll(one).count() === 0L)
  }
}
