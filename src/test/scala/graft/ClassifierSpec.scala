package graft

import org.apache.spark.sql.functions._
import graft.llm.Classifier

class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def toy = Seq(
    (1L, "good fine excellent prose here", 1),
    (2L, "good clean well formed text", 1),
    (3L, "excellent good structure and flow", 1),
    (4L, "spam junk garbage noise click", 0),
    (5L, "junk spam noise garbage filler", 0),
    (6L, "noise junk filler click spam", 0),
    (7L, "good excellent fine writing sample", 1),
    (8L, "garbage filler click spam junk", 0)
  ).toDF("doc_id", "text", "label")

  test("separable corpus: loss falls from ln 2, classes separate at 0.5") {
    val m = Classifier.trainLogReg(toy, "doc_id", "text", "label",
      dim = 256, iters = 40, lr = 8.0)
    assert(math.abs(m.lossTrace.head - math.log(2.0)) < 1e-9,
      s"zero model loss ${m.lossTrace.head} != ln 2")
    assert(m.lossTrace.last < m.lossTrace.head / 2,
      s"loss barely moved: ${m.lossTrace.head} -> ${m.lossTrace.last}")
    val scores = Classifier.score(toy, "doc_id", "text", m)
      .join(toy.select($"doc_id".as("doc"), $"label"), "doc")
      .as[(Long, Double, Int)].collect()
    val pos = scores.filter(_._3 == 1).map(_._2)
    val neg = scores.filter(_._3 == 0).map(_._2)
    assert(pos.min > 0.5 && neg.max < 0.5,
      s"not separated: pos.min=${pos.min} neg.max=${neg.max}")
  }

  test("retraining is bit-identical (decimal sums, sorted feature folds)") {
    val a = Classifier.trainLogReg(toy.repartition(7), "doc_id", "text", "label",
      dim = 128, iters = 6)
    val b = Classifier.trainLogReg(toy.repartition(2), "doc_id", "text", "label",
      dim = 128, iters = 6)
    assert(a.bias == b.bias)
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.lossTrace == b.lossTrace)
  }

  test("empty text scores the bias prior; null text scores NULL (unclassifiable)") {
    val df = Seq((1L, "alpha beta", 1), (2L, "", 0),
      (3L, null.asInstanceOf[String], 0)).toDF("doc_id", "text", "label")
    val feats = Classifier.featurize(df, "doc_id", "text", "label", 64)
    assert(feats.count() == 3)
    assert(feats.filter(size($"x") === 0).count() == 2)
    val m = Classifier.trainLogReg(df, "doc_id", "text", "label",
      dim = 64, iters = 3)
    val s = Classifier.score(df, "doc_id", "text", m)
      .orderBy($"doc").as[(Long, Option[Double])].collect()
    assert(s.length == 3)
    val biasScore = 1.0 / (1.0 + math.exp(-m.bias))
    // empty-but-present text: a known doc with no tokens → bias prior
    assert(math.abs(s(1)._2.get - biasScore) < 1e-12)
    // null text: unknown content must not be classified (r16 advice) —
    // a threshold gate sees null, never a silent base-rate admit/reject
    assert(s(2)._2.isEmpty)
  }

  test("null-label docs are dropped from training (r17 review)") {
    // the extra doc's tokens hash to buckets no labeled doc touches:
    // left in, its index would sum to a NULL gradient (NPE) and its
    // row would deflate every gradient through n — dropped, the model
    // must be bit-identical to training without it
    val withNull = toy.unionByName(Seq(
      (9L, "zzqx wwvy uupt", null.asInstanceOf[java.lang.Integer]))
      .toDF("doc_id", "text", "label"))
    val a = Classifier.trainLogReg(withNull, "doc_id", "text", "label",
      dim = 128, iters = 6)
    val b = Classifier.trainLogReg(toy, "doc_id", "text", "label",
      dim = 128, iters = 6)
    assert(a.bias == b.bias)
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.lossTrace == b.lossTrace)
  }

  test("labels that CAST to null are dropped too (string labels, r17 review)") {
    // the guard must filter on the post-cast value featurize consumes:
    // "junk" casts to null double and is exactly as unsupervised as a
    // null label
    val strLabels = toy.select($"doc_id", $"text",
      $"label".cast("string").as("label"))
    val withJunk = strLabels.unionByName(Seq(
      (9L, "zzqx wwvy uupt", "junk")).toDF("doc_id", "text", "label"))
    val a = Classifier.trainLogReg(withJunk, "doc_id", "text", "label",
      dim = 128, iters = 6)
    val b = Classifier.trainLogReg(strLabels, "doc_id", "text", "label",
      dim = 128, iters = 6)
    assert(a.bias == b.bias)
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.lossTrace == b.lossTrace)
  }

  test("score matches the featurize-shape margin to float tolerance") {
    val m = Classifier.trainLogReg(toy, "doc_id", "text", "label",
      dim = 256, iters = 5)
    val wLit = lit(m.weights)
    val viaFeats = Classifier.featurize(toy, "doc_id", "text", "label", 256)
      .select($"doc", aggregate($"x", lit(m.bias),
        (acc, f) => acc + f("v") * element_at(wLit, f("i") + 1)).as("mg"))
      .select($"doc", (lit(1.0) / (lit(1.0) + exp(-$"mg"))).as("s"))
      .as[(Long, Double)].collect().toMap
    Classifier.score(toy, "doc_id", "text", m)
      .as[(Long, Double)].collect().foreach { case (d, s) =>
        assert(math.abs(s - viaFeats(d)) < 1e-9, s"doc $d: $s vs ${viaFeats(d)}")
      }
  }
}
