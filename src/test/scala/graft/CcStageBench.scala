package graft

import graft.ops.{CorpusOps, Dedup}

import org.apache.spark.sql.functions._

/** Dev tool (test scope): stage-cost breakdown of the corpus pipeline.
  * Usage: sbt "Test/runMain graft.CcStageBench /root/testdata/sf0.1"
  */
object CcStageBench {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "cc-stage-bench")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[stage] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = GraftSession.table(spark, dir, "documents")
    docs.count() // warm footers + JIT
    val kept = CorpusOps.gopherFilter(docs, "text", minTokens = 20, maxTokens = 80, minStopwordHits = 1)
      .filter(col("keep")).select(col("doc_id"), col("text"))
    t("gopher")(kept.count())
    val pairs = Dedup.minhashExactPairs(kept, "doc_id", "text",
      w = 3, numHashes = 30, bands = 10, threshold = 0.9)
    t("pairs")(pairs.count())
    val pairsM = pairs.localCheckpoint()
    println(s"[stage] n_pairs = ${pairsM.count()}")
    t("cc-only-1")(Dedup.connectedComponents(pairsM).count())
    t("cc-only-2")(Dedup.connectedComponents(pairsM).count())
    t("cc-only-3")(Dedup.connectedComponents(pairsM).count())
    t("applyDedup")(Dedup.applyDedup(kept, "doc_id", pairs).count())
    t("pipeline-1")(SparkEntry.queries("x_corpus_pipeline")(spark, dir).count())
    t("pipeline-2")(SparkEntry.queries("x_corpus_pipeline")(spark, dir).count())
    spark.stop()
  }
}
