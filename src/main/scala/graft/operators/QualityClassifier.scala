package graft.operators

import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.Vector
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
  * vocabulary state, no shuffle. Training input is BOUNDED at
  * `maxTrainDocs` (a linear filter's quality saturates at a few hundred
  * thousand labeled examples — the same bound [[Ivf.writeIndexed]] puts
  * on k-means), which makes driver-local training the architecturally
  * right choice — fastText itself is a single-box SGD. The collect is
  * guarded: a `limit(cap+1)` probe per side (the [[Ann]] broadcast-probe
  * precedent) reads only ~cap rows even on a 100 TB corpus; only when a
  * side exceeds the cap does a count + deterministic
  * [[Corpus.sampleByHash]] pass run. The trained model is a single dense
  * weight vector of `numFeatures` doubles, broadcast for scoring —
  * scoring a 100 TB corpus is one map-only pass. Feature hashing means
  * train and score never exchange a vocabulary.
  *
  * Training is bit-deterministic given fixed inputs: the collected
  * sample is sorted by a content key and the SGD visit order is a
  * fixed-seed permutation, so two runs over the same corpus produce the
  * same weights (MLlib's distributed L-BFGS could not promise this —
  * float aggregation order varies with partitioning).
  */
object QualityClassifier {

  /** Trained model: dense weights over the hashed feature space plus
    * intercept — `8·numFeatures` bytes, broadcast for scoring. */
  case class QualityModel(weights: Array[Double], intercept: Double) {
    def numFeatures: Int = weights.length
  }

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

  private def sigmoid(m: Double): Double =
    1.0 / (1.0 + math.exp(-math.max(-35.0, math.min(35.0, m))))

  /** Train on a positive (curated) and negative (raw) corpus.
    *
    * Each side is capped at `maxTrainDocs / 2` documents. The fast path
    * is one job: featurize + `limit(cap+1)` collect per side (reads only
    * ~cap rows regardless of corpus size). A side that overflows the
    * probe is re-collected as a deterministic [[Corpus.sampleByHash]]
    * sample when `sampleIdCol` is given (stable across reruns and
    * repartitioning — the auditable choice), else a seeded `df.sample`;
    * that path costs one count pass over the oversized side.
    *
    * The local optimizer is logistic SGD with a linearly decaying step
    * and L2 applied to touched coordinates — `epochs` passes over at
    * most `maxTrainDocs` rows, corpus-size-independent.
    */
  def train(positive: DataFrame, negative: DataFrame, textCol: String,
            numFeatures: Int = 1 << 18, regParam: Double = 1e-4,
            epochs: Int = 20, maxTrainDocs: Long = 100000L,
            sampleIdCol: Option[String] = None): QualityModel = {
    require(maxTrainDocs > 0, s"maxTrainDocs must be positive, got $maxTrainDocs")
    require(epochs > 0, s"epochs must be positive, got $epochs")
    val cap = math.max(maxTrainDocs / 2, 1L).min(Int.MaxValue - 1).toInt

    def feats(df: DataFrame, label: Double): DataFrame =
      featurize(df.select(col(textCol)), textCol, numFeatures)
        .select(lit(label).as("label"), col("features"))

    // guarded probe: one job, ≤ cap+1 rows per side reach the driver
    val probe = feats(positive, 1.0).limit(cap + 1)
      .unionByName(feats(negative, 0.0).limit(cap + 1))
      .collect()
    val (posProbe, negProbe) = probe.partition(_.getDouble(0) == 1.0)

    def exactSample(df: DataFrame, label: Double, salt: String) = {
      val n = df.count()
      val bounded =
        if (n <= cap) df
        else sampleIdCol match {
          case Some(id) => Corpus.sampleByHash(df, id, cap.toDouble / n, salt)
          case None     => df.sample(withReplacement = false, fraction = cap.toDouble / n, seed = 42L)
        }
      feats(bounded, label).collect()
    }
    val posRows = if (posProbe.length <= cap) posProbe else exactSample(positive, 1.0, "qc-pos")
    val negRows = if (negProbe.length <= cap) negProbe else exactSample(negative, 0.0, "qc-neg")
    require(posRows.nonEmpty && negRows.nonEmpty,
      s"both corpora must be non-empty: ${posRows.length} positive, ${negRows.length} negative")

    // deterministic visit order: sort by a content key (ties are
    // identical (label, features) pairs — interchangeable under SGD)
    val data = (posRows ++ negRows).map { r =>
      val v = r.getAs[Vector](1).toSparse
      val key = (scala.util.hashing.MurmurHash3.arrayHash(v.indices).toLong << 32) |
        (java.util.Arrays.hashCode(v.values) & 0xffffffffL)
      (r.getDouble(0), key, v)
    }.sortBy(t => (t._1, t._2, t._3.numNonzeros))

    val w = new Array[Double](numFeatures)
    var b = 0.0
    val rng = new scala.util.Random(42)
    val order = data.indices.toArray
    val totalUpdates = epochs.toLong * data.length
    val lr0 = 0.5
    var t = 0L
    var e = 0
    while (e < epochs) {
      // fixed-seed Fisher–Yates: a new deterministic permutation per epoch
      var i = order.length - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val tmp = order(i); order(i) = order(j); order(j) = tmp
        i -= 1
      }
      var k = 0
      while (k < order.length) {
        val (label, _, v) = data(order(k))
        val lr = lr0 * (1.0 - t.toDouble / totalUpdates)
        var m = b
        var j = 0
        while (j < v.indices.length) { m += w(v.indices(j)) * v.values(j); j += 1 }
        val g = sigmoid(m) - label
        j = 0
        while (j < v.indices.length) {
          val c = v.indices(j)
          w(c) = w(c) * (1.0 - lr * regParam) - lr * g * v.values(j)
          j += 1
        }
        b -= lr * g
        t += 1
        k += 1
      }
      e += 1
    }
    QualityModel(w, b)
  }

  /** Score `df`: adds `quality_prob` in [0, 1] — P(text resembles the
    * positive corpus). Weights broadcast; map-only (the one UDF wraps a
    * broadcast-array dot product no built-in expresses — the
    * [[TextAnalysis]] lmScore precedent). */
  def score(df: DataFrame, textCol: String, model: QualityModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.weights)
    val intercept = model.intercept
    val prob = udf { v: Vector =>
      val weights = bc.value
      var m = intercept
      v.foreachActive((i, x) => m += weights(i) * x)
      sigmoid(m)
    }
    featurize(df, textCol, model.numFeatures)
      .withColumn("quality_prob", prob(col("features")))
      .drop("features")
  }

  /** Convenience gate: keep rows scoring at least `minProb`. */
  def filterByQuality(df: DataFrame, textCol: String,
                      model: QualityModel, minProb: Double): DataFrame =
    score(df, textCol, model).where(col("quality_prob") >= minProb)
      .drop("quality_prob")
}
