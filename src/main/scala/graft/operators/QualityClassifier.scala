package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality classification for corpus curation — the
  * fastText-style linear filter modern pipelines use ("pages similar to
  * a high-quality seed corpus"), as opposed to the fixed heuristics in
  * `TextAnalysis.qualityFilter`: label a small positive corpus (curated)
  * and a negative one (raw crawl), train a hashed-n-gram logistic
  * regression, then score everything.
  *
  * Scale design: featurization is the hashing trick — words + adjacent
  * bigrams hashed into a fixed `numFeatures` space map-side, no
  * vocabulary state, no shuffle. Training runs MLlib's distributed
  * L-BFGS over the (small) labeled set; the model is a single dense
  * vector of `numFeatures` weights, broadcast for scoring — scoring a
  * 100 TB corpus is one map-only pass. Feature hashing means train and
  * score never exchange a vocabulary.
  */
object QualityClassifier {

  /** Words + adjacent word bigrams, lowercased — the fastText feature
    * recipe. Pure column expressions; feeds [[HashingTF]]. */
  private def terms(textCol: String) = {
    val ws = split(lower(trim(col(textCol))), "\\s+")
    val bigrams = expr(
      "transform(slice(__ws, 1, greatest(size(__ws) - 1, 0)), (w, i) -> concat(w, '_', element_at(__ws, i + 2)))")
    (ws, bigrams)
  }

  private def featurize(df: DataFrame, textCol: String, numFeatures: Int): DataFrame = {
    val (ws, bigrams) = terms(textCol)
    // null text → null term array, which HashingTF NPEs on: an empty
    // term list scores at the model intercept instead
    val withTerms = df.withColumn("__ws", ws)
      .withColumn("__terms",
        coalesce(concat(col("__ws"), bigrams), array().cast("array<string>")))
    new HashingTF().setInputCol("__terms").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(withTerms)
      .drop("__ws", "__terms")
  }

  /** Train on a positive (curated) and negative (raw) corpus sample.
    * Deterministic given fixed inputs up to float aggregation order —
    * rankings are stable in practice, exact probabilities are not a
    * cross-run contract. */
  def train(positive: DataFrame, negative: DataFrame, textCol: String,
            numFeatures: Int = 1 << 18, regParam: Double = 1e-4,
            maxIter: Int = 50): LogisticRegressionModel = {
    val labeled = positive.select(col(textCol)).withColumn("label", lit(1.0))
      .unionByName(negative.select(col(textCol)).withColumn("label", lit(0.0)))
    val feats = featurize(labeled, textCol, numFeatures)
    new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(feats)
  }

  /** Score `df`: adds `quality_prob` in [0, 1] — P(text resembles the
    * positive corpus). Model weights broadcast; map-only. */
  def score(df: DataFrame, textCol: String, model: LogisticRegressionModel): DataFrame = {
    val numFeatures = model.numFeatures
    val feats = featurize(df, textCol, numFeatures)
    // copy before the column setters — they mutate in place, and the
    // caller's model should not change under them
    val scored = model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("features").setProbabilityCol("__prob")
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
      .transform(feats)
    val probAt1 = org.apache.spark.ml.functions.vector_to_array(col("__prob")).getItem(1)
    scored.withColumn("quality_prob", probAt1)
      .drop("features", "__prob", "__pred", "__raw")
  }

  /** Convenience gate: keep rows scoring at least `minProb`. */
  def filterByQuality(df: DataFrame, textCol: String,
                      model: LogisticRegressionModel, minProb: Double): DataFrame =
    score(df, textCol, model).where(col("quality_prob") >= minProb)
      .drop("quality_prob")
}
