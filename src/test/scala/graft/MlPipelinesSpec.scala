package graft

import graft.ops.MlPipelines

import org.apache.spark.sql.functions._

class MlPipelinesSpec extends SparkSpecBase {
  import spark.implicits._

  test("relevance classifier separates an easy synthetic signal") {
    // label 1 iff the text mentions 'emission' — linearly separable
    val train = (0 until 200).map { i =>
      if (i % 2 == 0) (s"report $i discusses emission reduction targets", 1.0)
      else (s"report $i discusses quarterly revenue figures", 0.0)
    }.toDF("text", "label")
    val model = MlPipelines.trainRelevanceClassifier(train)
    val acc = model.transform(train)
      .select(avg((col("prediction") === col("label")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.95)
  }

  test("MLlib MinHashLSH approxSimilarityJoin finds the planted near-dup") {
    val docs = GraftSession.table(spark, sf, "documents").select(col("doc_id"), col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 10000).as("doc_id"), concat(col("text"), lit(" zz")).as("text")))
    val pairs = MlPipelines.minhashLshJoin(planted, "doc_id", "text", maxDistance = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair is found; at jaccard-similarity >= 0.6 no
    // unrelated word-soup pair qualifies at this corpus size
    (0L until 5L).foreach(d => assert(pairs.contains((d, d + 10000)), s"missing planted pair $d"))
  }
}
