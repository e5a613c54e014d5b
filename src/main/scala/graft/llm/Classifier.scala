package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Model-based quality filtering — the fastText-style linear classifier
  * pass the public curation pipelines layer on top of rule-based
  * signals (Joulin 2016 "Bag of Tricks"; CCNet's LM filter lineage;
  * DCLM and FineWeb-Edu both gate on a trained quality classifier).
  * The reference has no learning surface at all; this is a
  * pipeline-component addition, like the dedup/ANN family.
  *
  * Logistic regression over HASHED mean-pooled bag-of-words features
  * (feature hashing, Weinberger 2009: `pmod(xxhash64(word), dim)` —
  * the same fixed-hash trick as [[graft.ops.CountMin]], and the same
  * reason: bounded state independent of vocabulary size). Training is
  * full-batch gradient descent run BY the driver but never ON the
  * driver: each iteration is ONE distributed aggregation over the
  * persisted featurized corpus producing a model-sized gradient
  * (≤ dim+2 rows), and the model rides back into the next iteration's
  * plan as a foldable array literal inside whole-stage codegen — the
  * IVF/PQ codebook discipline ([[Similarity]]): driver work and
  * driver-held state are bounded by the MODEL, not the corpus.
  *
  * 100 TB shape: featurization is one scan + one (doc,idx) partial
  * aggregation; each of the `iters` passes scans only the featurized
  * frame (hashed indices + counts — text never rescanned), and its
  * gradient shuffle partial-aggregates map-side down to ≤ dim+2 rows
  * per partition. Nothing unbounded ever reaches the driver.
  *
  * Determinism (oracle-grade): per-doc dot products run over
  * `sort_array`-ordered sparse features (fixed fold order); corpus
  * sums (gradient terms, loss terms) are cast to decimal(28,12) before
  * summing, the [[Text.unigramLogProb]] rule, so results are
  * partition-order independent. Retraining reproduces bit-identical
  * weights.
  */
object Classifier {

  /** Trained model: plain doubles, plan-literal-sized by construction. */
  final case class LogRegModel(dim: Int, bias: Double, weights: Array[Double],
                               lossTrace: Seq[Double]) {
    require(weights.length == dim, s"weight size ${weights.length} != dim $dim")
  }

  private def tokens(text: Column): Column =
    filter(Text.words(text), w => w =!= "")

  /** Hashed mean-pooled sparse features: (doc, y, x) where x is
    * array<struct<i:int, v:double>> sorted by feature index (the fixed
    * fold order that makes per-doc double sums deterministic), v =
    * token-count/n_tokens. Empty/whitespace-only docs get an empty x
    * (bias-only prediction). */
  def featurize(df: DataFrame, idCol: String, textCol: String,
                labelCol: String, dim: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
        col(labelCol).cast("double").as("y"),
        explode(tokens(col(textCol))).as("w"))
      .select(col("doc"), col("y"),
        pmod(xxhash64(col("w")), lit(dim.toLong)).cast("int").as("i"))
    val feats = toks.groupBy(col("doc"), col("y"), col("i"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc"), col("y"))
      .agg(sort_array(collect_list(struct(col("i"), col("c")))).as("ic"),
        sum(col("c")).as("n"))
      .select(col("doc"), col("y"),
        transform(col("ic"), f =>
          struct(f("i").as("i"),
            (f("c").cast("double") / col("n")).as("v"))).as("x"))
    df.select(col(idCol).as("doc"), col(labelCol).cast("double").as("y"))
      .join(feats.select(col("doc"), col("x")), Seq("doc"), "left")
      .select(col("doc"), col("y"),
        coalesce(col("x"),
          array().cast("array<struct<i:int,v:double>>")).as("x"))
  }

  /** Raw margin `b + w·x` under a weight literal — codegen'd fold over
    * the doc's sorted sparse features. */
  private def margin(x: Column, wLit: Column, bias: Double): Column =
    aggregate(x, lit(bias),
      (acc, f) => acc + f("v") * element_at(wLit, f("i") + 1))

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Full-batch GD on the logistic loss. Featurizes once (persisted),
    * then `iters` one-aggregation passes; returns the model with its
    * per-iteration mean-loss trace (loss BEFORE each update, so
    * `lossTrace.head` is the ln-2 chance loss of the zero model).
    * The default lr=4 is safe for full-batch GD here: the logistic
    * Hessian is bounded by max‖x‖²/4 and mean-pooled features have
    * ‖x‖² = Σ(c/n)² ≤ 1, so the loss cannot diverge at step sizes
    * below ~8 — and mean pooling's small per-feature values need the
    * large step to move at all. */
  def trainLogReg(df: DataFrame, idCol: String, textCol: String,
                  labelCol: String, dim: Int = 1024, iters: Int = 12,
                  lr: Double = 4.0): LogRegModel = {
    require(dim > 0 && iters > 0, "dim and iters must be positive")
    // docs whose label is null AFTER the double cast carry no
    // supervision: drop them up front (the training-side counterpart
    // of score()'s null-text rule). The filter casts exactly as
    // featurize consumes — a non-null string label that casts to
    // null/NaN is just as unsupervised as a null one. Left in, such
    // docs would inflate n while contributing null residual/loss
    // terms — and an index touched only by them would sum to a NULL
    // gradient and NPE in the driver fold below.
    val yCast = col(labelCol).cast("double")
    // null TEXT is dropped too (r17 review): score() refuses to
    // classify unknown content, so training must not learn from it
    // either — left in, each null-text doc became an all-zero feature
    // row pulling the bias toward its label every iteration
    val feats = graft.dsl.Rel.track(
      featurize(df.filter(yCast.isNotNull && !isnan(yCast) &&
            col(textCol).isNotNull),
          idCol, textCol, labelCol, dim)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val n = feats.count().toDouble
    require(n > 0, "trainLogReg needs a non-empty labeled corpus")

    val w = new Array[Double](dim)
    var bias = 0.0
    val trace = Vector.newBuilder[Double]
    for (_ <- 0 until iters) {
      val wLit = lit(w)
      val m = margin(col("x"), wLit, bias)
      // ONE aggregation carries the whole iteration: per-doc gradient
      // terms (idx ≥ 0), the bias gradient (idx −2), and the stable
      // softplus loss (idx −1) ride the same explode, partial-combined
      // map-side on idx down to ≤ dim+2 rows
      val r = sigmoid(m) - col("y") // residual dL/dm
      val lossTerm = greatest(m, lit(0.0)) - m * col("y") +
        log(lit(1.0) + exp(-abs(m)))
      val rows = feats
        .select(col("y"), col("x"), r.as("r"), lossTerm.as("l"))
        .select(explode(concat(
          transform(col("x"), f =>
            struct(f("i").as("i"), (col("r") * f("v")).as("v"))),
          array(struct(lit(-1).as("i"), col("l").as("v")),
            struct(lit(-2).as("i"), col("r").as("v"))))).as("t"))
        .groupBy(col("t.i").as("i"))
        .agg(sum(col("t.v").cast("decimal(28,12)")).cast("double").as("g"))
        .collect()
      var loss = 0.0
      var gBias = 0.0
      val gW = new Array[Double](dim)
      rows.foreach { row =>
        val i = row.getInt(0); val g = row.getDouble(1)
        if (i == -1) loss = g / n
        else if (i == -2) gBias = g / n
        else gW(i) = g / n
      }
      trace += loss
      bias -= lr * gBias
      var j = 0
      while (j < dim) { w(j) -= lr * gW(j); j += 1 }
    }
    feats.unpersist(blocking = false)
    LogRegModel(dim, bias, w, trace.result())
  }

  /** Score documents under a trained model: (doc, score ∈ (0,1)) —
    * pure codegen'd column math, the model as a foldable literal. The
    * standard filter is then `score >= threshold`.
    *
    * Null semantics (r16 advice): NULL text scores NULL — unknown
    * content must not be classified, the [[Dedup]] convention; a
    * threshold gate then neither admits nor rejects such docs
    * silently (`null >= τ` is null — route them explicitly). An
    * EMPTY-but-present text is a known document with no tokens and
    * scores the bias prior `sigmoid(b)`, the same margin training
    * assigned its empty feature row. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: LogRegModel): DataFrame = {
    val wLit = lit(model.weights)
    // mean-pooled dot in doc-token order: sum w[h(token)]/n equals the
    // featurize-shape dot (v = count/n) exactly in value; the float
    // fold order differs from training's sorted-index order, so scores
    // may differ from training margins in the last ulps — fine for a
    // threshold filter, stated here so nobody oracle-compares the two
    val toksN = size(tokens(col(textCol)))
    val dot = aggregate(tokens(col(textCol)), lit(0.0),
      (acc, t) => acc +
        element_at(wLit, pmod(xxhash64(t), lit(model.dim.toLong)).cast("int") + 1))
    val m = when(toksN > 0, lit(model.bias) + dot / toksN.cast("double"))
      .otherwise(lit(model.bias))
    df.select(col(idCol).as("doc"),
      when(col(textCol).isNull, lit(null).cast("double"))
        .otherwise(sigmoid(m)).as("score"))
  }
}
