package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M5/M6 — classical model training on the engine's ML-prep outputs
  * (SURVEY §2.9). The reference's ML6 stage fits sklearn
  * LogisticRegression / RandomForest per calendar fold
  * (`scripts/run_full_pipeline.py:1284-1290`, `src/models/ml6_extended
  * .py:66-300`); MLlib's distributed equivalents cover that class of
  * models. Exact sklearn parity is out of scope (different solvers) —
  * the contract is: same inputs (imputed, anti-leak, fold-split
  * matrices), deterministic seeds, metrics computed by the same
  * relational M6 aggregations the oracle checks.
  */
object Models {

  /** Assemble feature columns into MLlib's vector column. */
  def assemble(df: DataFrame, features: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(df)

  /** Fit class-balanced logistic regression on `train`, predict `test`.
    * Class weights mirror sklearn's class_weight="balanced":
    * w_c = n / (k * n_c). */
  def logisticRegression(train: DataFrame, test: DataFrame,
                         features: Seq[String], labelCol: String): DataFrame = {
    val counts = train.groupBy(col(labelCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val k = counts.size.toDouble
    val weightExpr = counts.foldLeft(lit(1.0)) { case (acc, (label, c)) =>
      when(col(labelCol) === label, lit(n / (k * c))).otherwise(acc)
    }
    val trainA = assemble(train, features).withColumn("w", weightExpr)
    val model = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features").setWeightCol("w")
      .setMaxIter(100).setRegParam(0.01)
      .fit(trainA)
    model.transform(assemble(test, features))
      .withColumnRenamed("prediction", "y_pred")
  }

  /** Random forest with the reference's deterministic seed. */
  def randomForest(train: DataFrame, test: DataFrame, features: Seq[String],
                   labelCol: String, numTrees: Int = 200, maxDepth: Int = 10): DataFrame = {
    val model = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(42)
      .fit(assemble(train, features))
    model.transform(assemble(test, features))
      .withColumnRenamed("prediction", "y_pred")
  }

  /** M6 — per-class precision/recall/F1 + macro-F1 from (y_true, y_pred),
    * as pure aggregation (the oracle-checked formulation). */
  def macroF1(pred: DataFrame, labelCol: String): Double = {
    val classes = pred.select(col(labelCol)).distinct().collect().map(_.get(0))
    val f1s = classes.map { c =>
      val row = pred.agg(
        sum(when(col(labelCol) === c && col("y_pred") === c, 1).otherwise(0)).as("tp"),
        sum(when(col(labelCol) =!= c && col("y_pred") === c, 1).otherwise(0)).as("fp"),
        sum(when(col(labelCol) === c && col("y_pred") =!= c, 1).otherwise(0)).as("fn"))
        .head()
      val (tp, fp, fn) = (row.getLong(0).toDouble, row.getLong(1).toDouble,
        row.getLong(2).toDouble)
      val p = if (tp + fp > 0) tp / (tp + fp) else 0.0
      val r = if (tp + fn > 0) tp / (tp + fn) else 0.0
      if (p + r > 0) 2 * p * r / (p + r) else 0.0
    }
    f1s.sum / f1s.length
  }
}
