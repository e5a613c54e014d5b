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
  *    (id, cell, vec) bucketed+sorted by `cell`
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
  * 100 TB shape: centroids are model-sized (nCells × dim doubles;
  * 4096 × 768 ≈ 25 MB) — read once per wiring, shipped as a foldable
  * plan literal; the index table is the corpus, touched only by
  * bucket-pruned scans; appends never touch corpus-sized data.
  * Re-train on distribution drift = [[build]] under a bumped manifest
  * `version` (rewrites manifest + index) — the LSH store's rebuild
  * contract, applied to vectors. Dim mismatches (THE operational
  * vector-store bug) fail loudly before any corpus-sized work via a
  * one-row dim probe in both [[append]] and [[query]].
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
    * (n_cells/dim match the centroid payload). Returns the codebook. */
  private[graft] def loadManifest(spark: SparkSession, manifestTable: String,
                                  op: String): Array[Array[Double]] = {
    val rows = spark.table(manifestTable)
      .select(col("n_cells").cast("int"), col("dim").cast("int"),
        col("centroids"))
      .limit(2).collect()
    require(rows.length == 1,
      s"$op: index manifest '$manifestTable' must have exactly one row, got " +
        s"${if (rows.length > 1) ">1" else "0"} — one manifest row per index")
    val r = rows(0)
    val cents = r.getSeq[scala.collection.Seq[Double]](2)
      .map(_.toArray).toArray
    require(cents.length == r.getInt(0) &&
        cents.forall(_.length == r.getInt(1)),
      s"$op: index manifest '$manifestTable' is internally inconsistent " +
        s"(n_cells=${r.getInt(0)}, dim=${r.getInt(1)} vs centroid payload " +
        s"${cents.length}×${cents.headOption.map(_.length).getOrElse(0)}) — " +
        "rebuild the index (VectorIndex.build)")
    cents
  }

  /** Dim probe: ONE row of the frame (bounded) against the manifest
    * dim, before any corpus-sized work. An empty frame passes (nothing
    * to mis-assign). */
  private def requireDim(df: DataFrame, vecCol: String, dim: Int,
                         op: String): Unit = {
    val d = df.select(size(col(vecCol)).cast("int")).limit(1).collect()
    require(d.isEmpty || d(0).getInt(0) == dim,
      s"$op: vector dim ${d(0).getInt(0)} != index dim $dim — " +
        "this frame was embedded under a different model; rebuild the " +
        "index or fix the pipeline (assigning it would silently place " +
        "every vector in garbage cells)")
  }

  /** (id, cell, vec) assignment under a fixed codebook — the one
    * shared definition [[build]] and [[append]] (and the spec's parity
    * twin) all use, so index layout can never drift from the kernel. */
  private[graft] def assign(df: DataFrame, idCol: String, vecCol: String,
                            cents: Array[Array[Double]]): DataFrame = {
    // integral ids required UP FRONT (the topKSelect contract, enforced
    // at index-build time, not first query): a silent cast("long") on a
    // string id column would store NULL ids — corruption, not an error
    val idType = df.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
        .contains(idType),
      s"VectorIndex: integral id column required (got $idType) — map string " +
        "ids to a surrogate long (e.g. xxhash64) before indexing")
    df.select(col(idCol).cast("long").as("id"),
      Similarity.nearestCellsExpr(cents, 1)(col(vecCol))(0).as("cell"),
      col(vecCol).as("vec"))
  }

  /** Build the persisted index: train the codebook, write the one-row
    * manifest table, assign the corpus and write it as the bucketed
    * index table. Overwrites both tables (a rebuild bumps `version`). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
            indexTable: String, manifestTable: String, buckets: Int,
            iters: Int = 3, maxTrain: Long = 100000L,
            version: Long = 1L): Unit = {
    val spark = corpus.sparkSession
    val cents = Similarity.kmeansCentroids(corpus, idCol, vecCol, nCells,
      iters, maxTrain)
    spark.sql(s"DROP TABLE IF EXISTS $manifestTable")
    manifestDf(spark, cents, version).write.format("parquet")
      .saveAsTable(manifestTable)
    graft.ops.Bucketed.writeBucketed(
      assign(corpus, idCol, vecCol, cents), indexTable, Seq("cell"), buckets)
  }

  /** Append a batch: assign against the MANIFEST centroids (batch-sized
    * work only) and append under the index's own validated bucket spec.
    * The bucket count is read from the catalog — it is a property of
    * the index, not of whoever appends. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             indexTable: String, manifestTable: String): Unit = {
    val spark = batch.sparkSession
    val cents = loadManifest(spark, manifestTable, "VectorIndex.append")
    requireDim(batch, vecCol, cents.head.length, "VectorIndex.append")
    val buckets = bucketCount(spark, indexTable, "VectorIndex.append")
    graft.ops.Bucketed.appendBucketed(
      assign(batch, idCol, vecCol, cents), indexTable, Seq("cell"), buckets)
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
    * assignment is read from the table instead of recomputed.
    * @return (query_id, neighbor_id, cosine, rk 1-based) per query ×
    *         min(k, probed rows) */
  def query(queries: DataFrame, queryId: String, vecCol: String,
            indexTable: String, manifestTable: String, k: Int,
            nprobe: Int = 3, excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadManifest(spark, manifestTable, "VectorIndex.query")
    requireDim(queries, vecCol, cents.head.length, "VectorIndex.query")
    val q = queries.select(col(queryId).cast("long").as("query_id"),
      col(vecCol).as("qv"),
      explode(Similarity.nearestCellsExpr(cents, nprobe)(col(vecCol))).as("cell"))
    val idx = spark.table(indexTable)
      .select(col("cell"), col("id").as("neighbor_id"), col("vec").as("cv"))
    // no distinct (the ivfKmeansTopK reasoning): nprobe DISTINCT cells
    // per query × one cell per neighbor → unique pairs by construction
    val scored = q.join(idx, Seq("cell"))
      .transform(df =>
        if (excludeSelf) df.filter(col("query_id") =!= col("neighbor_id"))
        else df)
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineExpr(col("qv"), col("cv")).as("cosine"))
    Similarity.topKSelect(scored, k)
  }
}
