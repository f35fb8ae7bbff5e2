package graft

import graft.ops.StatsTable

import org.apache.spark.sql.functions._

/** Incremental rollup maintenance: folding increments into the stored
  * stats table must be lossless — including the quantile synopsis,
  * whose semilattice merge is the load-bearing property.
  */
class StatsTableSpec extends SparkSpecBase {
  import spark.implicits._

  test("two appends ≡ one rebuild from the union, deep in the lossy regime") {
    val rng = new scala.util.Random(7)
    def slice(n: Int) = (1 to n).map(_ => (s"g${rng.nextInt(4)}", rng.nextInt(5000).toLong))
    val base = slice(3000)
    val inc1 = slice(800)
    val inc2 = slice(500)

    val maintained = java.nio.file.Files.createTempDirectory("stats-m").toString
    StatsTable.write(base.toDF("k", "v"), "k", "v", maintained, k = 32)
    StatsTable.append(inc1.toDF("k", "v"), "k", "v", maintained, k = 32)
    StatsTable.append(inc2.toDF("k", "v"), "k", "v", maintained, k = 32)

    val rebuilt = java.nio.file.Files.createTempDirectory("stats-r").toString
    StatsTable.write((base ++ inc1 ++ inc2).toDF("k", "v"), "k", "v", rebuilt, k = 32)

    def snap(p: String) = StatsTable.read(spark, p, k = 32, p = 50)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(snap(maintained) === snap(rebuilt))
    // 4 keys × ~1000 distinct values each >> k=32: the synopsis is
    // lossy, so the equality is the semilattice law, not exactness
    assert(snap(rebuilt).size === 4)
  }
}
