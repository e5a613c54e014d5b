package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the similarity-search twin of the
  * document ingest loop's durable stores (q129/q131). The inverted-file
  * layout (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
  * Neighbor Search" — the public IVF formulation) re-expressed
  * Spark-first:
  *
  *  - the coarse k-means codebook is trained ONCE at [[build]] time
  *    ([[Similarity.kmeansCentroids]] — capped sample, driver Lloyd)
  *    and persisted in a ONE-ROW MANIFEST TABLE next to the index
  *    (the [[Dedup.lshManifest]] versioned-store discipline: every
  *    later append/query loads the centroids FROM the manifest, so
  *    batch and query assignment can never drift from the build);
  *  - the "inverted lists" are one bucketed parquet TABLE
  *    (id, cell, vec, ver) bucketed+sorted by `cell`
  *    ([[graft.ops.Bucketed]]), so the probe equi-join and any
  *    per-cell maintenance aggregate are Exchange-free on the corpus
  *    side, and [[graft.ops.Bucketed.compact]] serves as the same
  *    scheduled file-count maintenance the document stores use;
  *  - [[append]] is BATCH-SIZED: assign the new vectors against the
  *    manifest centroids (one codegen'd `graft_nearest_cells` call per
  *    row — no retraining, no corpus re-assignment) and
  *    `appendBucketed` under the validated spec;
  *  - [[query]] probes `nprobe` nearest cells per query and runs the
  *    bounded [[graft.ops.TopKAgg]] top-k — identical scoring
  *    arithmetic to [[Similarity.ivfKmeansTopK]] (same kernels), the
  *    index table replacing the per-call corpus assignment.
  *
  * VERSION CROSS-CHECK (r20 review): a rebuild has two table writes
  * and EITHER write order leaves a crash window where manifest and
  * index disagree on the codebook — silently wrong probes with no
  * row-local symptom. So every index row carries the codebook version
  * (`ver`, a constant column — RLE-compressed to ~nothing in parquet)
  * and [[append]]/[[query]] require it to equal the manifest's version
  * via a one-row probe BEFORE corpus-sized work (one row suffices:
  * appends validate first, so a table can never hold mixed versions).
  * [[build]] writes the index FIRST and the manifest LAST; a crash
  * between them fails the next call loudly instead of mis-probing.
  *
  * 100 TB shape: centroids are model-sized (nCells × dim doubles;
  * 4096 × 768 ≈ 25 MB) — read once per wiring, shipped as a foldable
  * plan literal; the index table is the corpus, touched only by
  * bucket-pruned scans; appends never touch corpus-sized data.
  * Re-train on distribution drift = [[build]] again (auto-bumps the
  * manifest version) — the LSH store's rebuild contract, applied to
  * vectors. Dim mismatches (THE operational vector-store bug) fail
  * loudly before any corpus-sized work via a one-row dim probe in
  * both [[append]] and [[query]].
  */
object VectorIndex {

  /** One-row codebook manifest: (n_cells, dim, version, centroids). */
  private def manifestDf(spark: SparkSession, cents: Array[Array[Double]],
                         version: Long): DataFrame = {
    import spark.implicits._
    Seq((cents.length, cents.headOption.map(_.length).getOrElse(0),
        version, cents.map(_.toSeq).toSeq))
      .toDF("n_cells", "dim", "version", "centroids")
  }

  /** Fail-loud manifest load — driver-side, limit(2)-bounded like
    * [[Dedup.requireManifest]]: one row, internally consistent
    * (n_cells/dim match the centroid payload). Returns (codebook,
    * version). */
  private[graft] def loadManifest(spark: SparkSession, manifestTable: String,
                                  op: String): (Array[Array[Double]], Long) = {
    val rows = spark.table(manifestTable)
      .select(col("n_cells").cast("int"), col("dim").cast("int"),
        col("version").cast("long"), col("centroids"))
      .limit(2).collect()
    require(rows.length == 1,
      s"$op: index manifest '$manifestTable' must have exactly one row, got " +
        s"${if (rows.length > 1) ">1" else "0"} — one manifest row per index")
    val r = rows(0)
    val cents = r.getSeq[scala.collection.Seq[Double]](3)
      .map(_.toArray).toArray
    require(cents.length == r.getInt(0) &&
        cents.forall(_.length == r.getInt(1)),
      s"$op: index manifest '$manifestTable' is internally inconsistent " +
        s"(n_cells=${r.getInt(0)}, dim=${r.getInt(1)} vs centroid payload " +
        s"${cents.length}×${cents.headOption.map(_.length).getOrElse(0)}) — " +
        "rebuild the index (VectorIndex.build)")
    (cents, r.getLong(2))
  }

  /** Dim probe: ONE row of the frame (bounded) against the manifest
    * dim, before any corpus-sized work. An empty frame passes (nothing
    * to mis-assign). */
  private def requireDim(df: DataFrame, vecCol: String, dim: Int,
                         op: String): Unit = {
    val d = df.select(size(col(vecCol)).cast("int")).limit(1).collect()
    // a NULL probed vector must get the same loud diagnosis, never an
    // NPE or a cryptic "-1": size(null) is -1 under the engine's
    // legacy (ANSI-off) sizeOfNull and null under ANSI — cover both
    // (r20 ADVICE)
    val probed = if (d.isEmpty || d(0).isNullAt(0) || d(0).getInt(0) < 0) None
                 else Some(d(0).getInt(0))
    require(d.isEmpty || probed.contains(dim),
      s"$op: vector dim ${probed.map(_.toString).getOrElse("NULL (null vector)")} " +
        s"!= index dim $dim — " +
        "this frame was embedded under a different model; rebuild the " +
        "index or fix the pipeline (assigning it would silently place " +
        "every vector in garbage cells)")
  }

  /** Version probe: ONE index row (bounded — appends validate before
    * writing, so the table never holds mixed versions) against the
    * manifest version. An empty index passes (the first append under
    * any manifest is consistent by construction). */
  private def requireVersion(spark: SparkSession, indexTable: String,
                             manifestVersion: Long, op: String): Unit = {
    val r = spark.table(indexTable).select(col("ver").cast("long"))
      .limit(1).collect()
    require(r.isEmpty || r(0).getLong(0) == manifestVersion,
      s"$op: index table '$indexTable' holds codebook version " +
        s"${r(0).getLong(0)} but the manifest says $manifestVersion — a " +
        "rebuild crashed between its index and manifest writes; rebuild " +
        "the index (VectorIndex.build) before appending or querying")
  }

  /** (id, cell, vec, ver) assignment under a fixed codebook — the one
    * shared definition [[build]] and [[append]] (and the spec's parity
    * twin) all use, so index layout can never drift from the kernel. */
  private[graft] def assign(df: DataFrame, idCol: String, vecCol: String,
                            cents: Array[Array[Double]],
                            version: Long): DataFrame = {
    // integral ids required UP FRONT (the topKSelect contract, enforced
    // at index-build time, not first query): a silent cast("long") on a
    // string id column would store NULL ids — corruption, not an error
    Similarity.requireIntegralId(df.schema(idCol).dataType, "VectorIndex")
    df.select(col(idCol).cast("long").as("id"),
      Similarity.nearestCellsExpr(cents, 1)(col(vecCol))(0).as("cell"),
      col(vecCol).as("vec"), lit(version).as("ver"))
  }

  /** Build the persisted index: train the codebook, write the bucketed
    * index table, then the one-row manifest LAST (see the version
    * cross-check note above). Overwrites both tables.
    * @param version 0 (default) = auto: previous manifest version + 1
    *        (1 on first build) — rebuild-on-drift bumps it without the
    *        caller tracking state; pass an explicit value to pin. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
            indexTable: String, manifestTable: String, buckets: Int,
            iters: Int = 3, maxTrain: Long = 100000L,
            version: Long = 0L): Unit = {
    val spark = corpus.sparkSession
    // schema-only check first — fail before any corpus-sized work
    Similarity.requireIntegralId(corpus.schema(idCol).dataType, "VectorIndex")
    val ver =
      if (version != 0L) version
      else if (spark.sessionState.catalog.tableExists(
          spark.sessionState.sqlParser.parseTableIdentifier(manifestTable)))
        loadManifest(spark, manifestTable, "VectorIndex.build")._2 + 1L
      else 1L
    val cents = Similarity.kmeansCentroids(corpus, idCol, vecCol, nCells,
      iters, maxTrain)
    graft.ops.Bucketed.writeBucketed(
      assign(corpus, idCol, vecCol, cents, ver), indexTable, Seq("cell"),
      buckets)
    graft.ops.Bucketed.writePlain(manifestDf(spark, cents, ver), manifestTable)
  }

  /** Append a batch: assign against the MANIFEST centroids (batch-sized
    * work only) and append under the index's own validated bucket spec.
    * The bucket count is read from the catalog — it is a property of
    * the index, not of whoever appends. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             indexTable: String, manifestTable: String): Unit = {
    val spark = batch.sparkSession
    val (cents, ver) = loadManifest(spark, manifestTable, "VectorIndex.append")
    requireDim(batch, vecCol, cents.head.length, "VectorIndex.append")
    val buckets = bucketCount(spark, indexTable, "VectorIndex.append")
    requireVersion(spark, indexTable, ver, "VectorIndex.append")
    graft.ops.Bucketed.appendBucketed(
      assign(batch, idCol, vecCol, cents, ver), indexTable, Seq("cell"),
      buckets)
  }

  private def bucketCount(spark: SparkSession, table: String,
                          op: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    require(spark.sessionState.catalog.tableExists(ident),
      s"$op: index table '$table' does not exist — VectorIndex.build first")
    val spec = spark.sessionState.catalog.getTableMetadata(ident).bucketSpec
    require(spec.isDefined,
      s"$op: index table '$table' is not bucketed — not a graft-managed " +
        "vector index (VectorIndex.build first)")
    spec.get.numBuckets
  }

  /** Probe the persisted index: each query scores against its `nprobe`
    * nearest cells' vectors, bounded top-k per query. Identical
    * arithmetic to [[Similarity.ivfKmeansTopK]] — only the corpus
    * assignment is read from the table instead of recomputed; defaults
    * match the family convention (excludeSelf = true, the self-query
    * shape).
    * @return (query_id, neighbor_id, cosine, rk 1-based) per query ×
    *         min(k, probed rows) */
  def query(queries: DataFrame, queryId: String, vecCol: String,
            indexTable: String, manifestTable: String, k: Int,
            nprobe: Int = 3, excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val (cents, ver) = loadManifest(spark, manifestTable, "VectorIndex.query")
    requireDim(queries, vecCol, cents.head.length, "VectorIndex.query")
    requireVersion(spark, indexTable, ver, "VectorIndex.query")
    // query ids go through the SAME integral gate as indexed ids — a
    // silent cast would group every string-id query under NULL
    Similarity.requireIntegralId(queries.schema(queryId).dataType,
      "VectorIndex.query")
    // localCheckpoint, not persist+track (r20 ADVICE): the probe-cell
    // collect below and the join both consume q — without a
    // materialization the query lineage runs twice, and a
    // NONDETERMINISTIC source (sample, multi-partition limit, table
    // appended mid-plan) could produce join rows whose cell the
    // collected In filter never saw, silently pruning their buckets
    // away. A persist+track relied on the CALLER releasing in the
    // right order — a releaseTracked before consuming the result
    // re-opened exactly that hazard; the checkpoint severs the lineage
    // so filter and join provably read ONE materialization regardless
    // of caller release order. The frame is batch-sized (queries ×
    // nprobe rows).
    // RETENTION (r21 ADVICE): the checkpointed block is NOT released
    // here — the returned frame's lineage reads it, so query() cannot
    // sweep it without severing its own result; localCheckpoint blocks
    // are also invisible to clearCache/releaseTracked (the repo's
    // cache-hygiene notes). A long-lived session issuing many query
    // batches must sweep between batches with the getPersistentRDDs
    // snapshot-diff discipline (as ingestBatch and the Bench loop do)
    // AFTER consuming each result; otherwise blocks accumulate
    // batch-sized × batches.
    val q = queries.select(col(queryId).cast("long").as("query_id"),
        col(vecCol).as("qv"),
        explode(Similarity.nearestCellsExpr(cents, nprobe)(col(vecCol))).as("cell"))
      .localCheckpoint()
    // BUCKET PRUNING: the distinct probe-cell set is bounded by nCells
    // (model-sized — safe to collect at ANY query-batch size), and as a
    // literal In filter on the bucket column it lets the scan read ONLY
    // the buckets holding probed cells (SelectedBucketsCount in the
    // plan, spec-asserted) instead of the whole corpus — at production
    // shape (thousands of cells/buckets, tens of probe cells) that is
    // the difference between a bounded read and a full index scan per
    // query batch. The collect makes query() EAGER: it runs (and
    // caches) the query-side assignment at call time — one batch-sized
    // job, buying a corpus-sized scan prune.
    val probeCells = q.select(col("cell")).distinct().collect()
      .map(r => r.get(0) match {
        case i: Int => i; case l: Long => l.toInt
      })
    val idx = spark.table(indexTable)
      .filter(col("cell").isin(probeCells.map(Integer.valueOf): _*))
      .select(col("cell"), col("id").as("neighbor_id"), col("vec").as("cv"))
    // no distinct (the ivfKmeansTopK reasoning): nprobe DISTINCT cells
    // per query × one cell per neighbor → unique pairs by construction
    val scored = Similarity.dropSelf(q.join(idx, Seq("cell")), excludeSelf)
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineExpr(col("qv"), col("cv")).as("cosine"))
    Similarity.topKSelect(scored, k)
  }
}
