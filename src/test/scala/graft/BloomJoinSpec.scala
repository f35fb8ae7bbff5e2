package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (Spark's
  * `InjectRuntimeFilter`): when one join side is selectively
  * filtered, the optimizer builds a Bloom filter from the small
  * (creation) side and pushes `might_contain` into the
  * large (application) side's scan — at 100 TB this prunes shuffle
  * input before the exchange, the same effect dynamic partition
  * pruning has for partitioned keys. The production thresholds
  * (creation side < 10 MB, application side > 10 GB) never trigger
  * on test-sized data, so this spec lowers them to prove the
  * mechanism and document the config; GraftSession leaves defaults
  * alone, where the feature arms itself exactly when scans get big
  * enough to matter.
  */
class BloomJoinSpec extends SparkSpecBase {

  test("selective join injects a runtime Bloom filter into the probe side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = GraftSession.table(spark, sf, "lineitem")
      val ord = GraftSession.table(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") < 20000)
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$plan")
      // and it still computes the right thing
      assert(joined.agg(sum(col("n"))).head.getLong(0) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
