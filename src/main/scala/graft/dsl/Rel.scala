package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Join strategy hints, mirroring the reference's `JOIN … USING '…'`
  * clauses (SURVEY.md §2.1 #10-13). Default lets Catalyst/AQE choose —
  * a strict superset of the reference's trust-the-user model.
  */
sealed trait JoinHint
object JoinHint {
  /** Catalyst/AQE picks (sort-merge, shuffle-hash or broadcast). */
  case object Default extends JoinHint
  /** `USING 'replicated'` — fragment-replicate ⇒ broadcast hash join
    * [R: …/physicalLayer/relationalOperators/POFRJoin.java]. */
  case object Replicated extends JoinHint
  /** `USING 'skewed'` — handled by AQE skew-join splitting; the hint
    * additionally disables broadcast so the skew logic applies
    * [R: …/relationalOperators/POSkewedJoin.java]. */
  case object Skewed extends JoinHint
  /** `USING 'merge'` — pre-sorted inputs ⇒ sort-merge join
    * [R: …/relationalOperators/POMergeJoin.java]. */
  case object Merge extends JoinHint
  /** `USING 'merge-sparse'` — sparse-indexed right side in the
    * reference [R: …/relationalOperators/POMergeCogroup.java]; no Spark
    * analog, compiled as sort-merge (documented, SURVEY.md §2.1 #13). */
  case object MergeSparse extends JoinHint
}

/** A relation: the engine's core abstraction (SURVEY.md §1.1) — an
  * unordered bag of tuples bound to a lazy DataFrame. Statements build
  * new relations; nothing executes until an action (`store`/`dump`),
  * exactly like the reference's alias-by-alias dataflow
  * [R: src/org/apache/pig/PigServer.java].
  *
  * Each method documents the statement it implements and the physical
  * operator chain it replaces; the implementations are declarative
  * DataFrame ops so Catalyst plans the physical execution (predicate
  * pushdown, column pruning, join selection, partial aggregation — the
  * rewrites the reference implements by hand, SURVEY.md §4.1).
  */
object Rel {
  // Pipeline-internal persists (SPLIT's shared parent, dedup's shingle
  // frames) are created inside operators that return LAZY DataFrames, so
  // the operator itself can never know when it is safe to unpersist.
  // They register here; the application releases them once the consuming
  // action is done (Verify/Bench do so between queries). At cluster
  // scale this is the difference between bounded and monotonically
  // growing block-manager usage across a long job (VERDICT r3 item 4).
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a pipeline-internal persisted frame for later release. */
  private[graft] def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked frame (idempotent; safe mid-query only if
    * no returned DataFrame still needs them). Non-blocking by default;
    * pass blocking=true where the caller must NOT start the next
    * measurement until the blocks are really gone (Bench's operator-
    * slice loop: without the barrier, per-iteration internal persists
    * piled up faster than async removal drained them and evicted the
    * slice's own fixture — q125's slice iterations climbed
    * 2.3 s → 9.2 s across five iterations in bench_r18_run1). */
  def releaseTracked(blocking: Boolean = false): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking); d = tracked.poll() }
  }
}

final case class Rel(df: DataFrame) {

  private def spark = df.sparkSession

  // ------------------------------------------------------------ basic ops

  /** FILTER rel BY cond [R: …/relationalOperators/POFilter.java]. */
  def filterBy(cond: Column): Rel = Rel(df.filter(cond))

  /** FOREACH rel GENERATE … (flat projection)
    * [R: …/relationalOperators/POForEach.java]. */
  def foreach(exprs: Column*): Rel = Rel(df.select(exprs: _*))

  /** FOREACH … GENERATE *, newCol AS name. */
  def withColumnRel(name: String, c: Column): Rel = Rel(df.withColumn(name, c))

  /** FLATTEN(bag) — one output row per element; empty/null bags
    * eliminate the row (Pig semantics ⇒ `explode`, not `explode_outer`;
    * SURVEY.md §2.1 gotchas). Struct elements are splatted into
    * top-level fields like Pig's tuple-flatten.
    */
  def flatten(bagCol: String, as: String): Rel =
    // when the output keeps the bag's name, withColumn already replaced
    // it — dropping would delete the just-exploded result (r15 review)
    if (as == bagCol) Rel(df.withColumn(as, explode(col(bagCol))))
    else Rel(df.withColumn(as, explode(col(bagCol))).drop(bagCol))

  /** FLATTEN of multiple bags in one GENERATE = cross product of the
    * bags (chained explodes). */
  def flattenAll(bagCols: Seq[(String, String)]): Rel =
    bagCols.foldLeft(this) { case (r, (c, a)) => r.flatten(c, a) }

  /** SPLIT rel INTO a IF c1, b IF c2, … [OTHERWISE] — rows may reach
    * multiple outputs; the parent is persisted once so the fan-out
    * shares one scan (the reference's multi-query optimization,
    * [R: …/relationalOperators/POSplit.java], SURVEY.md §4.2).
    * Returns one Rel per condition, plus an OTHERWISE Rel if requested.
    */
  def split(conds: Seq[Column], otherwise: Boolean = false): Seq[Rel] = {
    val parent = Rel.track(df.persist(StorageLevel.MEMORY_AND_DISK))
    val branches = conds.map(c => Rel(parent.filter(c)))
    if (otherwise) branches :+ Rel(parent.filter(!conds.reduce(_ || _)))
    else branches
  }

  /** SAMPLE rel p — Bernoulli row sample (sugar for FILTER BY RANDOM()<p). */
  def sample(p: Double, seed: Long = 42L): Rel = Rel(df.sample(p, seed))

  /** DISTINCT rel — whole-tuple dedup
    * [R: …/relationalOperators/PODistinct.java]. */
  def distinctRel: Rel = Rel(df.distinct())

  /** LIMIT rel n [R: …/relationalOperators/POLimit.java]. With a
    * preceding orderBy Catalyst fuses to TakeOrderedAndProject (top-k,
    * no global sort materialization). */
  def limitRel(n: Int): Rel = Rel(df.limit(n))

  /** ORDER rel BY … — total order via range partitioning + local sort;
    * Spark's RangePartitioner replaces the reference's sampling job +
    * WeightedRangePartitioner [R: …/mapReduceLayer/WeightedRangePartitioner.java].
    */
  def orderBy(cols: Column*): Rel = Rel(df.orderBy(cols: _*))

  /** RANK rel BY keys [DENSE] — delegates to the 2-pass pipeline
    * (ops.Rank; SURVEY.md §2.1 #16), never a single-task window. */
  def rank(keyCols: Seq[String], ascending: Boolean = true,
           dense: Boolean = false, as: String = "rank"): Rel =
    Rel(if (dense) graft.ops.Rank.denseRank(df, keyCols, ascending, as)
        else graft.ops.Rank.rank(df, keyCols, ascending, as))

  /** Bare RANK — 1-based row number over a caller-supplied total order. */
  def rowNumber(sortCols: Seq[Column], as: String = "rank"): Rel =
    Rel(graft.ops.Rank.rowNumber(df, sortCols, as))

  /** ASSERT rel BY cond — raises if any row violates the predicate
    * [R: src/org/apache/pig/builtin/Assert.java]. Distributed check:
    * cheap `isEmpty` on the violating subset, no driver collect.
    */
  def assertBy(cond: Column, msg: String = "assertion failed"): Rel = {
    if (!df.filter(!coalesce(cond, lit(false))).isEmpty)
      throw new IllegalStateException(s"ASSERT violated: $msg")
    this
  }

  // ----------------------------------------------------------- set algebra

  /** UNION — positional, no dedup [R: …/relationalOperators/POUnion.java]. */
  def union(other: Rel): Rel = Rel(df.union(other.df))

  /** UNION ONSCHEMA — match by name, null-fill missing columns. */
  def unionOnSchema(other: Rel): Rel =
    Rel(df.unionByName(other.df, allowMissingColumns = true))

  /** CROSS [R: …/relationalOperators/POCross.java] — the reference
    * parallelizes via synthetic GFCross keys; Spark's
    * CartesianProduct/BroadcastNestedLoop already distributes. */
  def cross(other: Rel): Rel = Rel(df.crossJoin(other.df))

  // ----------------------------------------------------------------- joins

  /** JOIN r1 BY k1, r2 BY k2 — equi-join; null keys never match
    * (SURVEY.md §2.1 #8: Pig and SQL agree). Hints map the reference's
    * USING clauses onto Catalyst strategies.
    */
  def join(other: Rel, leftKeys: Seq[String], rightKeys: Seq[String],
           joinType: String = "inner", hint: JoinHint = JoinHint.Default): Rel = {
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => df(l) === other.df(r) }
      .reduce(_ && _)
    val right = hint match {
      case JoinHint.Replicated => broadcast(other.df)
      case JoinHint.Merge | JoinHint.MergeSparse => other.df.hint("merge")
      case JoinHint.Skewed     => other.df.hint("shuffle_merge")
      case JoinHint.Default    => other.df
    }
    Rel(df.join(right, cond, joinType))
  }

  /** Pig's anti-join idiom (COGROUP + IsEmpty filter, PigMix L5) as a
    * first-class op. */
  def antiJoin(other: Rel, leftKeys: Seq[String], rightKeys: Seq[String]): Rel = {
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => df(l) === other.df(r) }.reduce(_ && _)
    Rel(df.join(other.df, cond, "left_anti"))
  }

  def semiJoin(other: Rel, leftKeys: Seq[String], rightKeys: Seq[String]): Rel = {
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => df(l) === other.df(r) }.reduce(_ && _)
    Rel(df.join(other.df, cond, "left_semi"))
  }

  // ------------------------------------------------------------- grouping

  /** GROUP rel BY keys — see [[GroupedRel]]: the caller chooses the
    * fused-aggregate path (combiner-friendly) or the materialized-bag
    * path, mirroring the reference's CombinerOptimizer decision
    * (SURVEY.md §4.2).
    */
  def group(keys: Column*): GroupedRel = GroupedRel(df, keys)

  /** GROUP rel ALL — single global group. */
  def groupAll: GroupedRel = GroupedRel(df, Seq(lit(true).as("all")))

  /** COGROUP this BY k1, other BY k2 — full-outer n-ary co-grouping
    * producing (group, bag1, bag2) [R: src/org/apache/pig/newplan/logical/relational/LOCogroup.java].
    * Encoded as per-input bag aggregation + full-outer join on the key;
    * missing sides get empty bags (Pig semantics).
    */
  def cogroup(other: Rel, leftKey: String, rightKey: String): Rel = {
    val l = df.groupBy(col(leftKey).as("group"))
      .agg(collect_list(struct(df.columns.map(col).toIndexedSeq: _*)).as("bag1"))
    val r = other.df.groupBy(col(rightKey).as("group"))
      .agg(collect_list(struct(other.df.columns.map(col).toIndexedSeq: _*)).as("bag2"))
    val joined = l.join(r, Seq("group"), "full_outer")
    Rel(joined.select(
      col("group"),
      coalesce(col("bag1"), array()).as("bag1"),
      coalesce(col("bag2"), array()).as("bag2")))
  }

  // ----------------------------------------------------------- cube/rollup

  /** CUBE rel BY CUBE(dims) + aggregation — native Catalyst Expand
    * replaces the reference's CubeDimensions row-expansion UDF
    * [R: src/org/apache/pig/builtin/CubeDimensions.java]. */
  def cube(dims: Seq[Column], aggs: Seq[Column]): Rel =
    Rel(df.cube(dims: _*).agg(aggs.head, aggs.tail: _*))

  /** ROLLUP analog [R: src/org/apache/pig/builtin/RollupDimensions.java]. */
  def rollup(dims: Seq[Column], aggs: Seq[Column]): Rel =
    Rel(df.rollup(dims: _*).agg(aggs.head, aggs.tail: _*))

  // ---------------------------------------------------------------- output

  /** STORE rel INTO path [R: …/relationalOperators/POStore.java]. */
  def store(path: String, format: String = "parquet",
            mode: String = "overwrite"): Unit =
    df.write.format(format).mode(mode).save(path)

  /** STORE with hive-style partition directories — the 100 TB sink
    * shape: readers prune partitions before any scan (the reference's
    * MultiStorage piggyback analog, [R: piggybank MultiStorage.java]).
    * Caller picks low-cardinality columns; each task writes one file
    * per in-task partition value, so pre-sort/repartition by the
    * partition columns to avoid small-file explosion.
    */
  def storePartitioned(path: String, partitionCols: Seq[String],
                       format: String = "parquet",
                       mode: String = "overwrite"): Unit =
    df.write.format(format).partitionBy(partitionCols: _*).mode(mode).save(path)

  /** DUMP — driver-side display. */
  def dump(n: Int = 20): Unit = df.show(n, truncate = false)

  /** DESCRIBE. */
  def describe(): String = df.schema.treeString

  /** EXPLAIN. */
  def explainRel(): Unit = df.explain("formatted")

  /** STREAM rel THROUGH 'cmd' — pipe rows through an external process,
    * tab-delimited in/out like PigStorage defaults
    * [R: …/relationalOperators/POStream.java,
    *  R: src/org/apache/pig/impl/streaming/ExecutableManager.java].
    * Output rows are parsed back with the supplied schema-apply fn.
    */
  def streamThrough(cmd: String, delim: String = "\t"): Rel = {
    // concat_ws SKIPS null columns, which would shift every later
    // field left and silently misalign the external command's view —
    // Pig's PigStreaming writes nulls as empty fields between
    // delimiters, so coalesce each field to "" (r15 review)
    val strings = df.select(
      concat_ws(delim,
        df.columns.map(c => coalesce(col(c).cast("string"), lit(""))).toIndexedSeq: _*))
    val piped = strings.rdd.map(_.getString(0)).pipe(cmd)
    val out = spark.createDataset(piped)(org.apache.spark.sql.Encoders.STRING)
    Rel(out.toDF("line"))
  }

}

/** Result of GROUP/COGROUP before the downstream FOREACH decides what to
  * do with the bags. Two compilation paths (SURVEY.md §4.2 Combiner):
  *
  *  - [[agg]]: FOREACH grouped GENERATE aggregates → fused straight to
  *    `groupBy().agg()` so Spark's partial/final HashAggregate gives the
  *    map-side combine the reference implements via Algebraic UDFs.
  *  - [[bag]]: the raw Pig result `(group, bag-of-input-tuples)` via
  *    collect_list(struct(*)) — only safe for bounded groups (bags do
  *    not spill per-row; SURVEY.md §7.4 hard part #1).
  */
final case class GroupedRel(df: DataFrame, keys: Seq[Column]) {

  /** Fused-combiner path: direct aggregation. */
  def agg(aggs: Column*): Rel =
    Rel(df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))

  /** Materialized-bag path: (group, bag). */
  def bag(bagName: String = "bag"): Rel =
    Rel(df.groupBy(keys: _*)
      .agg(collect_list(struct(df.columns.map(col).toIndexedSeq: _*)).as(bagName)))

  /** Bag of a single column (common FOREACH g GENERATE group, x.f). */
  def bagOf(c: Column, bagName: String = "bag"): Rel =
    Rel(df.groupBy(keys: _*).agg(collect_list(c).as(bagName)))
}
