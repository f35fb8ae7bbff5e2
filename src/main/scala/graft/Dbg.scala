import graft._
import graft.ops.Dedup
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "dbg")
    val d = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id").as("id"), col("text"))
    val hs = d.select(col("id"), transform(Dedup.tokens(col("text")), t => xxhash64(t)).as("hs"))
    val sh = hs.select(col("id"), Dedup.shingleHashesOf(col("hs"), 3).as("sh"))
    val pair = sh.filter(col("id").isin(8, 245)).collect()
    val a = pair(0).getSeq[Long](1).toSet; val b = pair(1).getSeq[Long](1).toSet
    println(s"sizes ${a.size} ${b.size} inter ${a.intersect(b).size}")
    val sig = sh.select(col("id"), Dedup.minhashSignatureFast(col("sh"), 16).as("sig"))
    val sp = sig.filter(col("id").isin(8, 245)).collect()
    val sa = sp(0).getSeq[Long](1); val sb = sp(1).getSeq[Long](1)
    println("sigA " + sa.mkString(","))
    println("sigB " + sb.mkString(","))
    println("agree " + sa.zip(sb).count(x => x._1 == x._2))
    // token hash diversity
    val th = hs.select(explode(col("hs")).as("h")).distinct().count()
    println(s"distinct token hashes: $th")
    val shd = sh.select(explode(col("sh")).as("h")).distinct().count()
    val sht = sh.select(explode(col("sh")).as("h")).count()
    println(s"distinct shingle hashes: $shd of $sht")
    spark.stop()
  }
}
