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
}
