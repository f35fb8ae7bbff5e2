package graft.ops

import org.apache.spark.ml.{Pipeline => MlPipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, MinHashLSHModel, RegexTokenizer}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib faces of the engine (BASELINE north star: "Spark DataFrame
  * ETL + MLlib pipelines").
  *
  *   - [[trainRelevanceClassifier]]: the Spark-side analog of the
  *     reference's relevance model head (SURVEY §2.8 M4 maps
  *     farm_trainer.py onto "MLlib CrossValidator over a logistic
  *     head"). Not a transformer parity target — the real model is a
  *     pluggable [[graft.scorer.RelevanceScorer]] — but the curated
  *     datasets this engine produces feed exactly this shape.
  *   - [[minhashLshJoin]]: MLlib's MinHashLSH `approxSimilarityJoin`
  *     as the library-native alternative to [[Dedup.minhashLshPairs]]
  *     (SURVEY §7.2 step 7).
  */
object MlPipelines {

  /** question+context text-pair relevance classifier:
    * tokenize → hashed TF → logistic regression. Deterministic: all
    * stages are seed-free or seeded.
    */
  def trainRelevanceClassifier(
      train: DataFrame, // (text: String, label: Double)
      numFeatures: Int = 1 << 14,
      maxIter: Int = 20
  ): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("features").setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label").setMaxIter(maxIter)
    new MlPipeline().setStages(Array(tok, tf, lr)).fit(train)
  }

  /** k-fold cross-validated hyperparameter selection for the relevance
    * head — the MLlib analog of the reference's FARM k-fold CV +
    * hyperparameter search (farm_trainer.py:291-348 `run_cv` /
    * trainer_optuna.py:14-120): `CrossValidator` over a regParam grid,
    * areaUnderROC as the selection metric, seeded folds.
    *
    * Scale: each (fold, param) fit is an independent Spark job;
    * `parallelism` bounds how many run concurrently — at cluster
    * scale the k·|grid| fits dominate, and they parallelize across
    * the cluster exactly like any other MLlib training job.
    *
    * Returns the fitted CrossValidatorModel (bestModel inside) and
    * the selected regParam.
    */
  def crossValidateRelevance(
      train: DataFrame, // (text: String, label: Double)
      regParams: Seq[Double] = Seq(0.0, 0.01, 0.1, 1.0),
      numFolds: Int = 3,
      numFeatures: Int = 1 << 14,
      maxIter: Int = 20,
      parallelism: Int = 4,
      elasticNetParam: Double = 0.0
  ): (CrossValidatorModel, Double) = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("features").setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label").setMaxIter(maxIter)
      .setElasticNetParam(elasticNetParam)
    val grid = new ParamGridBuilder().addGrid(lr.regParam, regParams).build()
    val cv = new CrossValidator()
      .setEstimator(new MlPipeline().setStages(Array(tok, tf, lr)))
      .setEvaluator(new BinaryClassificationEvaluator()
        .setLabelCol("label").setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(42L)
    val model = cv.fit(train)
    val bestReg = model.bestModel.asInstanceOf[PipelineModel]
      .stages.last.asInstanceOf[LogisticRegressionModel].getRegParam
    (model, bestReg)
  }

  /** Near-dup candidate pairs via MLlib MinHashLSH over hashed binary
    * token vectors. Returns (id_a, id_b, jaccard_distance) with
    * id_a < id_b, distance below `maxDistance` (jaccard similarity
    * >= 1 - maxDistance).
    */
  def minhashLshJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashTables: Int = 8,
      maxDistance: Double = 0.5,
      numFeatures: Int = 1 << 16
  ): DataFrame = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens").setPattern("\\s+")
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__features")
      .setNumFeatures(numFeatures).setBinary(true)
    val prepared = tf.transform(tok.transform(df.select(col(idCol).as("id"), col(textCol))))
      .select(col("id"), col("__features"))
    val lsh = new MinHashLSH()
      .setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model: MinHashLSHModel = lsh.fit(prepared)
    model
      .approxSimilarityJoin(prepared, prepared, maxDistance, "jaccard_distance")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        round(col("jaccard_distance"), 4).as("jaccard_distance"))
      .filter(col("id_a") < col("id_b"))
  }
}
