package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // two clearly separable populations: fluent-ish prose vs token noise
  private def goodDoc(i: Int) =
    s"the quick brown fox jumps over the lazy dog near river $i and reads a long book about history"
  private def badDoc(i: Int) =
    s"zz$i qqq 919 @@@ lorem##$i xx yy zz kk jj pp qq %% ^^ && **"

  private lazy val pos = (1 to 60).map(i => (i.toLong, goodDoc(i))).toDF("doc_id", "text")
  private lazy val neg = (1 to 60).map(i => (i.toLong + 1000, badDoc(i))).toDF("doc_id", "text")

  test("separable corpora classify cleanly and scores order correctly") {
    val model = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12)
    val heldPos = (61 to 70).map(i => (i.toLong, goodDoc(i))).toDF("doc_id", "text")
    val heldNeg = (61 to 70).map(i => (i.toLong + 1000, badDoc(i))).toDF("doc_id", "text")
    val scored = QualityClassifier.score(heldPos.union(heldNeg), "text", model)
      .select($"doc_id", $"quality_prob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every held-out good doc outscores every held-out bad doc
    val worstGood = (61 to 70).map(i => scored(i.toLong)).min
    val bestBad = (61 to 70).map(i => scored(i.toLong + 1000)).max
    assert(worstGood > bestBad,
      s"worst good $worstGood should exceed best bad $bestBad")
    assert(worstGood > 0.5 && bestBad < 0.5)
    // probabilities are probabilities
    assert(scored.values.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("filterByQuality gates the corpus and preserves schema") {
    val model = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12)
    val mixed = pos.limit(5).union(neg.limit(5))
    val kept = QualityClassifier.filterByQuality(mixed, "text", model, 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.count() == 5)
    assert(kept.where($"doc_id" > 1000).count() == 0)
  }

  test("scoring is a map-only plan (no shuffle)") {
    val model = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12)
    val plan = QualityClassifier.score(pos, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("training is bit-deterministic across runs and repartitioning") {
    val m1 = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12)
    val m2 = QualityClassifier.train(pos.repartition(7), neg.repartition(3), "text",
      numFeatures = 1 << 12)
    assert(m1.intercept == m2.intercept)
    assert(java.util.Arrays.equals(m1.weights, m2.weights))
  }

  test("maxTrainDocs bounds each side via the deterministic hash sample") {
    // cap of 40 → ≤20 per side out of 60; training must still separate
    val model = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12,
      maxTrainDocs = 40L, sampleIdCol = Some("doc_id"))
    val heldPos = (61 to 70).map(i => (i.toLong, goodDoc(i))).toDF("doc_id", "text")
    val heldNeg = (61 to 70).map(i => (i.toLong + 1000, badDoc(i))).toDF("doc_id", "text")
    val scored = QualityClassifier.score(heldPos.union(heldNeg), "text", model)
      .select($"doc_id", $"quality_prob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val worstGood = (61 to 70).map(i => scored(i.toLong)).min
    val bestBad = (61 to 70).map(i => scored(i.toLong + 1000)).max
    assert(worstGood > bestBad)
    // the bounded path is ALSO deterministic (hash sample, not RNG)
    val again = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12,
      maxTrainDocs = 40L, sampleIdCol = Some("doc_id"))
    assert(java.util.Arrays.equals(model.weights, again.weights))
  }

  test("an empty side is rejected, not silently trained through") {
    val empty = pos.where(lit(false))
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(pos, empty, "text", numFeatures = 1 << 12)
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("null and empty text score without crashing") {
    val model = QualityClassifier.train(pos, neg, "text", numFeatures = 1 << 12)
    val edge = Seq[(Long, String)]((1L, null), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(edge, "text", model)
    // null text → null terms → HashingTF sees nothing scoreable; rows
    // must survive with a defined probability or be dropped consistently
    assert(out.count() + out.where($"quality_prob".isNull).count() >= 2)
  }
}
