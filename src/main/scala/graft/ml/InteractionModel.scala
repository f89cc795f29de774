package graft.ml

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML layer (SURVEY §2.11 M1-M5): a random-forest
  * binary classifier over the four evidence scores, with a nested
  * train/eval harness and a scoring write-back.
  *
  * Reference: caret::train(method="rf", metric="ROC") with 5-fold ×10
  * repeatedcv (bin/CalculatePredModel.R:47-57), outer 80/20 × 25
  * iterations (:68-170), predict → Interacts/NotInteracts →
  * write-back (bin/PredictRelationships.R:70-75,
  * bin/AddPredictedRelationships.pl:88).
  *
  * Spark-first: features stay distributed end-to-end; the "write-back"
  * is a column join, not a per-row REST upsert. Splits use
  * hash-deterministic stratified sampling (graft.operators.Sampling)
  * so every iteration is reproducible across partitionings.
  */
object InteractionModel {

  val FeatureCols: Seq[String] = Seq("crispr", "blast", "blastx", "pfam")

  /** Assemble feature vector + binary label from an edges table with
    * `interaction` boolean ground truth (null-safe: missing → 0). */
  def features(edges: DataFrame, labelCol: String = "interaction"): DataFrame = {
    val filled = edges.na.fill(0.0, FeatureCols)
      .withColumn("label", col(labelCol).cast("double"))
    new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
      .transform(filled)
  }

  /** M1 — train the RF classifier (seeded). */
  def train(train: DataFrame, numTrees: Int = 500, seed: Long = 42L)
      : RandomForestClassificationModel =
    new RandomForestClassifier()
      .setNumTrees(numTrees)
      .setFeatureSubsetStrategy("3") // caret mtry=3 of 4 features
      .setLabelCol("label").setFeaturesCol("features")
      .setSeed(seed)
      .fit(train)

  /** M5 — AUC + sensitivity + specificity at the 0.5 threshold. */
  def evaluate(model: RandomForestClassificationModel, test: DataFrame)
      : Map[String, Double] = {
    val scored = model.transform(test).cache()
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scored)
    val cm = scored.agg(
      sum(when(col("label") === 1 && col("prediction") === 1, 1).otherwise(0)).as("tp"),
      sum(when(col("label") === 1 && col("prediction") === 0, 1).otherwise(0)).as("fn"),
      sum(when(col("label") === 0 && col("prediction") === 0, 1).otherwise(0)).as("tn"),
      sum(when(col("label") === 0 && col("prediction") === 1, 1).otherwise(0)).as("fp"))
      .head()
    val (tp, fn, tn, fp) = (cm.getLong(0), cm.getLong(1), cm.getLong(2), cm.getLong(3))
    scored.unpersist()
    Map("auc" -> auc,
      "sensitivity" -> (if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)),
      "specificity" -> (if (tn + fp == 0) 0.0 else tn.toDouble / (tn + fp)))
  }

  /** M2 — nested CV: outer stratified 80/20 splits × `iterations`,
    * report per-iteration AUC/sens/spec (the reference reports their
    * median — bin/CalculatePredModel.R:287, data/avgaucnested.tsv). */
  def nestedCv(data: DataFrame, iterations: Int, numTrees: Int = 100,
      seed: Long = 42L): Seq[Map[String, Double]] = {
    import graft.operators.Sampling
    val prepared = features(data).cache()
    (0 until iterations).map { i =>
      val withU = prepared.withColumn("__u",
        Sampling.hashUnit(seed + i, col("phage"), col("bacteria")))
      val tr = withU.where(col("__u") < 0.8).drop("__u")
      val te = withU.where(col("__u") >= 0.8).drop("__u")
      val m = train(tr, numTrees, seed + i)
      evaluate(m, te)
    }
  }

  /** M3 — score all candidate edges and write the prediction back as a
    * column (the declarative replacement for the per-row
    * PredictedInteraction upsert). Candidates = any positive evidence
    * (reference bin/PredictRelationships.R:68 filter). */
  def scoreAndWriteBack(model: RandomForestClassificationModel, edges: DataFrame)
      : DataFrame = {
    val cand = features(edges.filter(
      greatest(FeatureCols.map(col): _*) > 0), "interaction")
    model.transform(cand)
      .withColumn("predictedInteraction",
        when(col("prediction") === 1.0, "Interacts").otherwise("NotInteracts"))
      .drop("features", "rawPrediction", "probability", "prediction", "label")
  }

  /** M4 — feature importances as a table. */
  def importances(model: RandomForestClassificationModel): Seq[(String, Double)] =
    FeatureCols.zip(model.featureImportances.toArray)
}
