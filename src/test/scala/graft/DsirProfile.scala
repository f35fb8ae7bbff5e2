package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the DSIR selection stages (not a spec).
  *   sbt "Test/runMain graft.DsirProfile /root/repo/benchdata/sf1"
  */
object DsirProfile {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val spark = GraftSession.local(32, "graft-dsir-profile")
    val d     = GraftSession.table(spark, dir, "documents")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // stage 0: raw tokenize+count floor (no features, no md5)
    time("tokenize+count")(
      d.select(size(split(lower(col("text")), " ")).as("n")).agg(sum(col("n"))).collect())

    // stage 1: feature explode + md5 bucket + groupBy — the docB build
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    val feats = d.select(col("doc_id"), toks.as("__t"))
      .select(col("doc_id"), concat(col("__t"),
        when(size(col("__t")) >= 2, expr(
          "transform(sequence(0, size(__t) - 2), " +
            "i -> concat(element_at(__t, i + 1), ' ', element_at(__t, i + 2)))"))
          .otherwise(array().cast("array<string>"))).as("__f"))
    time("features only (no md5)")(
      feats.select(explode(col("__f")).as("f")).agg(count(lit(1))).collect())
    val bucketed = feats.select(col("doc_id"), explode(col("__f")).as("f"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("f")), 1, 4), 16, 10).cast("long"), lit(4096L)).as("bucket"))
    time("features+md5 (no agg)")(
      bucketed.agg(sum(col("bucket"))).collect())
    val docB = bucketed.groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
    time("docB full (groupBy)")(docB.agg(count(lit(1))).collect())

    // full operator for reference
    time("hashedAffinityScore full")(
      graft.ops.TextAnalysis.hashedAffinityScore(
        d, "doc_id", "text", d.filter(col("lang") === "de"), "text",
        buckets = 4096, scale = 1000000L)
        .orderBy(col("affinity").desc, col("doc_id").asc).limit(100).count())
    spark.stop()
  }
}
