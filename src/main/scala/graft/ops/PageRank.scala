package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank (Brin & Page 1998) over an edge list, in
  * EXACT fixed-point integer arithmetic — the iterative-graph operator
  * family (the reference's closest surface is repeated
  * JOIN/GROUP rounds scripted by hand [R: test/e2e/pig/ iterative
  * scripts], which is exactly what this compiles to, minus the
  * re-scans).
  *
  * Arithmetic contract: ranks are longs scaled by `scale` (default
  * 1e12); the contribution `r div outdeg` and the damping
  * `insum·85 div 100` use integral division, so every iteration is
  * exact integer math — deterministic under any partitioning, and
  * re-derivable in ANSI SQL (the q122 oracle unrolls the same
  * recurrence with `//`). The truncation loses < outdeg ulps of 1e-12
  * per node per iteration — noise at ranking granularity, bought for
  * bit-exact cross-engine equality (the integer-PR analog of the
  * repo's integer-nano BM25 scores).
  *
  * Scale shape (the 100 TB contract):
  *   - out-degree is attached to the edge list ONCE; the per-iteration
  *     work is one hash join (edges ⋈ ranks on src) + one aggregation
  *     (sum by dst) — the canonical two-shuffle PR round;
  *   - edges+degree are persisted pre-partitioned by `src`, so only
  *     the (much smaller) rank table moves each round;
  *   - each new rank table is persisted and the previous unpersisted —
  *     lineage stays one iteration deep, no exponential replay;
  *   - dangling nodes: callers with directed graphs should add
  *     reverse edges or accept the standard leak; the q122 bipartite
  *     graph is bidirectional, so every node has outdeg ≥ 1.
  */
object PageRank {

  val DefaultScale = 1000000000000L // 1e12 fixed-point

  /** @param edges (src long, dst long) directed edges, pre-deduped by
    *              the caller if multiplicity is not intended.
    * @return (node, r) — r is the scaled rank after `iterations`
    *         damped rounds from the uniform start `scale div N`.
    */
  def ranks(edges0: DataFrame, iterations: Int = 5,
            scale: Long = DefaultScale): DataFrame = {
    require(iterations >= 1, "pagerank needs at least one iteration")
    val edges = edges0.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // degree rides the edge list once; partitioned by src so each
    // round's join moves only the rank table
    val eod = edges.join(outdeg, Seq("src"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = (scale / n) * 15 / 100
    var ranks = nodes.select(col("node"), lit(scale / n).as("r"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val insum = eod.join(ranks, eod("src") === ranks("node"))
        .select(eod("dst"), expr("r div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("insum"))
      val next = graft.dsl.Rel.track(
        nodes.join(insum, nodes("node") === insum("dst"), "left")
          .select(nodes("node"),
            (lit(teleport) + expr("coalesce(insum, 0L) * 85 div 100")).as("r"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      next.count() // materialize before dropping the parent
      prev.foreach(_.unpersist())
      prev = Some(next)
      ranks = next
    }
    nodes.unpersist()
    eod.unpersist()
    ranks
  }
}
