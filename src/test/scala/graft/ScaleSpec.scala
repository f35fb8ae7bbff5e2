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
}
