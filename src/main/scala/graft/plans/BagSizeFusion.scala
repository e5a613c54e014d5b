package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst rule: `size(collect_list(x))` inside an Aggregate rewrites
  * to `count(x)` — the bag never materializes, partial aggregation
  * applies, and the unbounded-bag hazard (SURVEY.md §7.4 #1)
  * disappears for the counting case.
  *
  * This is the optimizer-level backstop for Pig's combiner optimization
  * [R: …/mapReduceLayer/CombinerOptimizer.java]: the DSL and the Pig
  * front-end fuse GROUP→FOREACH aggregates at construction time, but a
  * hand-written `collect_list` + `size` plan still gets fixed here.
  * (By the time the optimizer runs, CollapseProject has merged the
  * size() projection into the Aggregate, so the whole pattern is one
  * expression tree.)
  *
  * Semantics: collect_list drops nulls and count(x) skips nulls —
  * exact rewrite. Other uses of the same bag are untouched (they keep
  * their own collect_list aggregate).
  */
object BagSizeFusion extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      val rewritten = agg.aggregateExpressions.map(_.transform {
        // fire ONLY on the plain form: a DISTINCT collect_list or one
        // with a FILTER clause has different semantics than count(x),
        // and the bound fields must not be silently discarded
        case Size(AggregateExpression(CollectList(child, _, _), _, false, None, _), _) =>
          Cast(Count(child).toAggregateExpression(), IntegerType)
      }.asInstanceOf[NamedExpression])
      if (rewritten == agg.aggregateExpressions) agg
      else agg.copy(aggregateExpressions = rewritten)
  }
}

/** SparkSessionExtensions hook: set
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (Graft.configure does this) to install the engine's optimizer rules.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BagSizeFusion)
    ext.injectOptimizerRule(_ => DelayFlattenPastJoin)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductF].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_dot expects 2 arguments, got ${children.size}")
        DotProductF(children.head, children(1))
      }))
    // Native rolling-hash document fingerprint (see FingerprintF):
    // graft_fingerprint(text) — codegen'd replacement for the
    // interpreted per-character aggregate() fold.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fingerprint"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FingerprintF].getName, "graft_fingerprint"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1,
          s"graft_fingerprint expects 1 argument, got ${children.size}")
        FingerprintF(children.head)
      }))
    // Native sign-LSH bucket (see SignLshF):
    // graft_lsh_bucket(vec, planes[, offset]) — codegen'd replacement
    // for the Scala UDF on the embedding scan hot path (q39/q43/q79);
    // the optional offset selects the hyperplane family per LSH table.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lsh_bucket"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SignLshF].getName, "graft_lsh_bucket"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2 || children.size == 3,
          s"graft_lsh_bucket expects 2 or 3 arguments (vec, planes[, offset]), got ${children.size}")
        SignLshF(children.head, children(1),
          if (children.size > 2) children(2)
          else org.apache.spark.sql.catalyst.expressions.Literal(0))
      }))
    // Native IVF cell assignment (see NearestCellsF):
    // graft_nearest_cells(vec, codebook, n) — codegen'd replacement for
    // the per-row Scala UDF assign/probe on the q42 k-means ANN path;
    // the codebook is a foldable array<array<double>> literal.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nearest_cells"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NearestCellsF].getName, "graft_nearest_cells"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          s"graft_nearest_cells expects 3 arguments (vec, codebook, n), got ${children.size}")
        NearestCellsF(children.head, children(1), children(2))
      }))
    // Native hashed k-word shingle set + minhash band keys (see
    // ShingleHashesF): graft_shingle_hashes(text, k) and
    // graft_band_keys(hashes, numHashes, bands) — codegen'd
    // replacements for the rdd.mapPartitions + createDataFrame hops in
    // the minhash-LSH / n-gram-Jaccard / decontamination pipelines.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingle_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShingleHashesF].getName, "graft_shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_shingle_hashes expects 2 arguments (text, k), got ${children.size}")
        ShingleHashesF(children.head, children(1))
      }))
    // graft_bpe_tokens(text, merges) — BPE subword encode under a
    // foldable merge-table literal (see BpeTokensF).
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_tokens"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeTokensF].getName, "graft_bpe_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_bpe_tokens expects 2 arguments (text, merges), got ${children.size}")
        BpeTokensF(children.head, children(1))
      }))
    // graft_minhash_sig(hashes, numHashes) / graft_band_keys_sig(sig,
    // bands) — the split form of graft_band_keys: the signature is the
    // persistable store row of the incremental LSH dedup, band keys
    // re-derive from it.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinhashSigF].getName, "graft_minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_minhash_sig expects 2 arguments (hashes, numHashes), got ${children.size}")
        MinhashSigF(children.head, children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_band_keys_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BandKeysSigF].getName, "graft_band_keys_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_band_keys_sig expects 2 arguments (sig, bands), got ${children.size}")
        BandKeysSigF(children.head, children(1))
      }))
    // graft_gram_hashes(text, k) — positional per-window gram hashes
    // (order + duplicates preserved) for span-level dedup; the
    // positional sibling of graft_shingle_hashes.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_gram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GramHashesF].getName, "graft_gram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_gram_hashes expects 2 arguments (text, k), got ${children.size}")
        GramHashesF(children.head, children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_band_keys"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BandKeysF].getName, "graft_band_keys"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          s"graft_band_keys expects 3 arguments (hashes, numHashes, bands), got ${children.size}")
        BandKeysF(children.head, children(1), children(2))
      }))
    // graft_normalize(text) — NFKC + lowercase + accent-strip +
    // whitespace-collapse canonicalization (see NormalizeTextF), the
    // pre-dedup normalization pass.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeTextF].getName, "graft_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1,
          s"graft_normalize expects 1 argument, got ${children.size}")
        NormalizeTextF(children.head)
      }))
    // Spark's native bloom probe (the one runtime row-level filtering
    // uses): graft_might_contain(serialized_bloom, xxhash64(key)).
    // Codegen'd, no Scala UDF — see graft.ops.BloomJoin.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_might_contain expects 2 arguments, got ${children.size}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
