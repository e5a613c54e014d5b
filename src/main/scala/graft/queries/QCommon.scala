package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for the driver-contract query objects — ONE home for
  * the table loader and the oracle-determinism decimal cast (they were
  * copy-pasted per object, so a change to the determinism contract
  * could silently apply to only some query groups; r17 review). */
// private[graft] (was private[queries]): the scale-curve harness needs
// copyBase too — its q119/q126 blocks were the LAST hardcoded +1e9
// bases in the repo (r19 VERDICT task 2: at 256× scaled ids reach
// ~2.55e9, so +1e9 copies ALIAS store ids)
private[graft] object QCommon {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Money-sum determinism: exact decimal(18,2) accumulation, cast to
    * double only at the end — bit-identical across engines. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Multiset difference of two same-schema frames: rows whose
    * per-side multiplicities differ, ONE aggregation over the tagged
    * union (guide §2.4 "remove shuffles outright"). The capstone
    * parity booleans previously ran `a.exceptAll(b).count() == 0 &&
    * b.exceptAll(a).count() == 0` — TWO actions, each rewritten by
    * Catalyst into its own union+aggregate over both inputs (4 scans
    * of each side, 2 shuffles) — to decide exactly this predicate.
    * One tagged union + one hash aggregation + `isEmpty` (limit-1)
    * computes the same multiset equality with half the scans and one
    * shuffle; at 100 TB store sizes the saving is a full extra pass
    * over both stores per parity check. Null/NaN grouping semantics
    * match exceptAll's (both normalize via the aggregation path). */
  def multisetDiff(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, sum}
    // fail LOUDLY on schema drift (r21 ADVICE): the old exceptAll pair
    // errored on arity mismatch, but the by-name select below would
    // silently project a wider b down to a's columns and compare equal;
    // and an input already carrying a reserved helper column would
    // corrupt the tagged union
    require(a.columns.toSet == b.columns.toSet,
      s"multisetDiff: column sets differ — a=${a.columns.mkString(",")} " +
        s"vs b=${b.columns.mkString(",")}; a parity check across drifted " +
        "schemas must fail, not pass vacuously")
    require(!a.columns.contains("graft_mse_side") &&
        !a.columns.contains("graft_mse_delta"),
      "multisetDiff: inputs must not carry the reserved graft_mse_side/" +
        "graft_mse_delta helper columns")
    val cols = a.columns.toSeq
    a.withColumn("graft_mse_side", lit(1L))
      .unionByName(b.select(cols.map(col): _*)
        .withColumn("graft_mse_side", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("graft_mse_side")).as("graft_mse_delta"))
      .filter(col("graft_mse_delta") =!= 0L)
  }

  /** Multiset equality in ONE job ([[multisetDiff]] + limit-1 probe) —
    * semantically identical to the two-sided exceptAll emptiness pair. */
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean =
    multisetDiff(a, b).isEmpty

  /** Run INDEPENDENT Spark jobs concurrently from a small driver pool
    * (guide §2.6 "overlap independent jobs"): Spark's scheduler happily
    * runs several jobs at once inside one application — actions are
    * only sequential because driver code calls them sequentially. The
    * ingest capstones submit three same-shaped store writes per round
    * whose wall-clock is driver/job overhead, not data; overlapping
    * them collapses sum-of-jobs to max-of-jobs. ONLY for jobs with no
    * ordering contract: [[graft.llm.Curate.ingestBatch]]'s idx → sig →
    * fp append ORDER is its crash-replay correctness argument and must
    * stay sequential. Exceptions: the first failure is rethrown (its
    * cause, not the ExecutionException wrapper) after all tasks finish.
    */
  def parJobs(tasks: (() => Unit)*): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = t()
      }))
      // collect every outcome before throwing: a half-submitted round
      // must not leave sibling writes racing the caller's error path
      val errs = futs.flatMap(f =>
        try { f.get(); None }
        catch { case e: java.util.concurrent.ExecutionException => Some(e.getCause) })
      errs.headOption.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Copy-id base for the re-ingest fixtures (q109/q119/q126–q129 and
    * the bench slices): `max(id) + 1`, DERIVED from the data — a
    * hardcoded constant aliases copy ids with real ids on a
    * salted/256× id space (the r18 q128 review finding). ONE
    * definition with ONE empty-corpus guard: on an empty corpus
    * `max()` is NULL and an unguarded `getLong` was an opaque NPE
    * (r19 review) — return 1L instead, preserving the pre-derivation
    * behavior (no copies exist to collide; the queries emit their
    * empty/vacuous results, matching their oracles). */
  def copyBase(df: DataFrame, idCol: String): Long = {
    import org.apache.spark.sql.functions.{col, max}
    val r = df.agg(max(col(idCol))).head()
    if (r.isNullAt(0)) 1L else r.getLong(0) + 1L
  }

  /** The q130 split-invariance fixture, ONE definition for the query
    * and its operator slice (the evensBatch rule: duplicated fixture
    * math drifts, and then operator_sec silently prices a different
    * operator than the headline runs): a bounded ≤1500-real-doc
    * sub-corpus with ids shifted ×10 plus a planted a~b~c near-dup
    * chain (the LlmSpec sliding-window texts, J(a,b)=J(b,c)≈0.58,
    * J(a,c)≈0.31 at threshold 0.45), chain ids ≡1 (mod 10) — one per
    * id tercile so prefix splits at (t1, t2) put each member in its
    * own batch, never colliding with the ×10 real ids.
    *
    * @return (corpus NOT persisted — caller persists/tracks,
    *         t1, t2, aId, bId, cId)
    */
  def chainCorpus(s: SparkSession, dir: String)
      : (DataFrame, Long, Long, Long, Long, Long) = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val d0 = t(s, dir, "documents").filter(col("doc_id") < 1500)
      .select((col("doc_id") * 10).as("doc_id"), col("text"))
    // max over an EMPTY sub-corpus is null → an opaque NPE at getLong;
    // fail with the cause instead (a corpus whose ids all exceed the
    // fixed 1500 bound — e.g. a salted/256× id space; r19 review)
    val maxRow = d0.agg(max(col("doc_id"))).head()
    require(!maxRow.isNullAt(0),
      "chainCorpus: no documents with doc_id < 1500 — the q130 fixture's " +
        "fixed sub-corpus bound does not fit this corpus's id space")
    val maxId = maxRow.getLong(0)
    val t1 = maxId / 3; val t2 = 2 * maxId / 3
    // below ~60 the ‑9-shifted chain ids can fall outside their
    // terciles, collide, or go negative — corrupting the fixture
    // SILENTLY (the spec only pins the real-sf corpus); fail with the
    // diagnosis instead, like the empty-corpus guard above (r19 ADVICE)
    require(maxId >= 60,
      s"chainCorpus: sub-corpus max doc_id $maxId < 60 — too small to place " +
        "one planted chain member per id tercile without collisions")
    def w(from: Int, until: Int) = (from until until).map(i => s"w$i").mkString(" ")
    val aId = t1 - t1 % 10 - 9
    val bId = t2 - t2 % 10 - 9
    val cId = maxId - maxId % 10 - 9
    val chain = Seq((aId, w(1, 41)), (bId, w(11, 51)), (cId, w(21, 61)))
      .toDF("doc_id", "text")
    (d0.unionByName(chain), t1, t2, aId, bId, cId)
  }
}
