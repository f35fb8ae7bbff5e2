package graft.tools

import graft.GraftSession
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Throwaway perf probe (dev only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "probe")
    val d = GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id").as("id"), col("text"))
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(d.count())
    val sh = d.select(col("id"), transform(Dedup.tokens(col("text")), t => xxhash64(t)).as("hs"))
      .select(col("id"), Dedup.shingleHashesOf(col("hs"), 3).as("sh")).filter(size(col("sh")) > 0)
    time("shingleHashes-forced")(sh.select(xxhash64(col("sh")).as("x")).agg(sum(col("x").cast("double"))).head())
    val sig = sh.select(col("id"), Dedup.minhashSignatureFast(col("sh"), 16).as("sig"))
    time("sig-forced")(sig.select(xxhash64(col("sig")).as("x")).agg(sum(col("x").cast("double"))).head())
    time("minhash-pairs")(Dedup.minhashLshPairs(d, "id", "text", w = 3, numHashes = 16, bands = 4, threshold = 0.5).count())
    time("minhash-pairs2")(Dedup.minhashLshPairs(d, "id", "text", w = 3, numHashes = 16, bands = 4, threshold = 0.5).count())
    time("minhash-md5-pairs")(Dedup.minhashLshPairsMd5(d, "id", "text").count())
    time("simhash-pairs")(Dedup.simhashPairs(d, "id", "text", maxHamming = 7).count())
    time("jaccard-pairs")(Dedup.jaccardPairs(d, "id", "text", 3, 0.5).count())
    spark.stop()
  }
}
