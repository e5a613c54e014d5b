package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dsl.PigFunctions.roundCompat
import graft.ops.TopKAgg

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`). Additions beyond the reference's surface
  * (which has no vector ops) for the training-data-pipeline north star.
  *
  * Dot products accumulate left-to-right in double precision — a fixed
  * order, so results are reproducible across partitionings and match a
  * sequential SQL oracle bit-for-bit. The HOF Column forms (dot/cosine/
  * lshBucket) are kept for expression composition and as the
  * SQL-readable spec, and the JVM kernels ([[cosineK]], [[bucketK]])
  * state the same arithmetic as plain loops; the operators themselves
  * evaluate through the native codegen'd expressions
  * ([[graft.plans.DotProductF]] via [[cosineExpr]],
  * [[graft.plans.SignLshF]] via [[bucketExpr]]) — bit-equal to both
  * (spec/ScalaCheck-asserted), but inside whole-stage codegen: Spark's
  * array higher-order functions fall back to interpreted evaluation
  * (CodegenFallback) and a Scala UDF pays serialization, each measured
  * ~5-10x slower on this hot path.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (→ null, like Pig
    * division by zero — SURVEY.md §2.1 gotchas). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(null)).otherwise(dot(a, b) / d)
  }

  // ------------------------- JVM kernels (bit-identical to the Column forms)

  private[graft] def dotK(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Cosine, rounded via the roundCompat formula; null (None) for zero
    * vectors — same arithmetic and order as the Column composition. */
  private[graft] def cosineK(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    val d = math.sqrt(dotK(a, a)) * math.sqrt(dotK(b, b))
    if (d == 0.0) None
    else Some(math.floor(dotK(a, b) / d * 1e6 + 0.5) / 1e6)
  }

  private def planeComponentK(j: Int, i: Int): Double = {
    val m = ((j * 64 + i).toLong * 2654435761L) % 1000003L
    (m % 2001L - 1000L).toDouble / 1000.0
  }

  /** Sign-LSH bucket, identical to [[lshBucket]]; `offset` selects the
    * hyperplane family (table t of a multi-table index = offset
    * t·planes; offset 0 is the single-table bucket). */
  private[graft] def bucketK(v: Seq[Float], planes: Int, offset: Int = 0): Long = {
    var acc = 0L; var j = 0
    while (j < planes) {
      var d = 0.0; var i = 0; val n = v.length
      while (i < n) { d += v(i).toDouble * planeComponentK(offset + j, i); i += 1 }
      if (d > 0) acc |= 1L << j
      j += 1
    }
    acc
  }

  /** Codegen'd cosine through the native `graft_dot` expression
    * ([[graft.plans.DotProductF]], registered by GraftExtensions) —
    * identical arithmetic order to [[cosineK]], so results are
    * bit-equal; stays inside whole-stage codegen. */
  private[graft] def cosineExpr(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
    val d = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(d === 0.0, lit(null))
      .otherwise(floor(dot(a, b) / d * 1e6 + 0.5) / 1e6)
  }
  /** Codegen'd sign-LSH bucket through the native `graft_lsh_bucket`
    * expression ([[graft.plans.SignLshF]], registered by
    * GraftExtensions) — identical arithmetic order to [[bucketK]] and
    * the HOF [[lshBucket]], so buckets are bit-equal (KernelPropsSpec);
    * stays inside whole-stage codegen, no Scala UDF on the embedding
    * scan. */
  private[graft] def bucketExpr(planes: Int)(v: Column): Column =
    call_function("graft_lsh_bucket", v, lit(planes))

  /** [[bucketExpr]] for table `t` of a multi-table LSH index —
    * hyperplane family at offset t·planes, disjoint per table. */
  private[graft] def bucketExprTable(planes: Int, table: Int)(v: Column): Column =
    call_function("graft_lsh_bucket", v, lit(planes), lit(table * planes))

  /** The multi-table banding projection every LSH consumer shares:
    * one row per (id, table, bucket), buckets from the codegen'd
    * expression, one evaluation per (row, table). Table 0 is the
    * single-table bucket (offset 0), so `tables = 1` reproduces the
    * plain [[bucketExpr]] banding exactly.
    */
  private[graft] def bandedBuckets(df: DataFrame, idCol: String, vecCol: String,
                                   planes: Int, tables: Int,
                                   outId: String = "doc"): DataFrame =
    df.select(col(idCol).as(outId), posexplode(array(
        (0 until tables).map(t => bucketExprTable(planes, t)(col(vecCol))): _*)))
      .toDF(outId, "tbl", "bucket")

  /** Per-query top-k via the bounded [[graft.ops.TopKAgg]] aggregator:
    * partial/final aggregation keeps k rows per map task — no full sort
    * of the scored pairs through a window exchange. Output matches the
    * window row_number formulation exactly (score desc, id asc ties).
    */
  private def topKSelect(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val agg = TopKAgg.topK(k)
    scored.filter(col("cosine").isNotNull)
      .groupBy("query_id")
      .agg(agg(col("cosine"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col._2").as("neighbor_id"),
        col("col._1").as("cosine"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** Brute-force cosine top-k: every query row against every corpus row,
    * then a per-query window top-k. The cross join broadcasts the
    * smaller side (queries); the window partitions by query id so the
    * top-k never funnels through one task. This is the exact baseline
    * the ANN variants are measured against.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryId: String, corpusId: String, vecCol: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineExpr(col("qv"), col("cv")).as("cosine"))
    topKSelect(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component: an integer-only
    * formula (multiplicative hashing, exactly reproducible in any SQL
    * engine) mapped to [-1, 1] in steps of 1e-3.
    * component(j, i) = (((j*64+i) * 2654435761) mod 1000003 mod 2001 - 1000) / 1000
    */
  def planeComponent(j: Column, i: Column): Column =
    ((pmod(pmod((j * 64 + i) * lit(2654435761L), lit(1000003L)), lit(2001L)) - 1000L)
      .cast("double") / 1000.0)

  /** Sign-LSH bucket id over `planes` deterministic hyperplanes: bit j =
    * sign(v · h_j). Same-bucket vectors are candidate neighbors. */
  def lshBucket(v: Column, planes: Int = 8): Column =
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, j) => {
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * planeComponent(j, i)),
        lit(0.0), (a, x) => a + x)
      acc + when(d > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
    })

  /** LSH-bucketed ANN top-k: exact cosine, but only within the query's
    * bucket — the scale path (bucket count grows 2^planes, so each
    * bucket's cross product stays bounded). Recall is approximate by
    * construction; increase `planes` ↓ cost / ↓ recall, and
    * `tables` > 1 restores recall with a multi-table (OR-of-ANDs)
    * index — candidates share a bucket in ANY table's disjoint
    * hyperplane family, deduplicated before scoring (same design as
    * `Dedup.embeddingNearDup`). `tables = 1` is the original plan.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              queryId: String, corpusId: String, vecCol: String,
              k: Int, planes: Int = 8, tables: Int = 1): DataFrame = {
    val scored = if (tables <= 1) {
      val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
        bucketExpr(planes)(col(vecCol)).as("bucket"))
      val c = corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv"),
        bucketExpr(planes)(col(vecCol)).as("bucket"))
      q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineExpr(col("qv"), col("cv")).as("cosine"))
    } else {
      val cand = bandedBuckets(queries, queryId, vecCol, planes, tables, "query_id")
        .join(bandedBuckets(corpus, corpusId, vecCol, planes, tables, "neighbor_id"),
          Seq("tbl", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"))
        .distinct()
      cand
        .join(queries.select(col(queryId).as("query_id"), col(vecCol).as("qv")), "query_id")
        .join(corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          cosineExpr(col("qv"), col("cv")).as("cosine"))
    }
    topKSelect(scored, k)
  }

  // ------------------------------ IVF with a k-means coarse quantizer

  /** Train a coarse k-means quantizer with a few Lloyd iterations.
    * Deterministic init (lowest-id vectors); the model (k × dim doubles)
    * is tiny and lives on the driver, like any coarse-quantizer
    * codebook — the data-parallel work (assignment, per-cell means) runs
    * as DataFrame aggregations.
    *
    * Scale: Lloyd iterations scan the TRAINING set, not the corpus — a
    * corpus larger than `maxTrain` vectors is down-sampled (seeded, so
    * the codebook is deterministic for a fixed input partitioning)
    * before training. A coarse quantizer needs only a representative
    * sample (k ≪ sample ≪ corpus); assignment still covers every row.
    */
  /** First `k` distinct vectors from an ordered candidate pool; if the
    * pool holds fewer than k distinct values, the remainder are filled
    * by deterministically jittering the distinct ones — k-means init
    * must never start with coincident centroids (ties assign to the
    * lower index, so a duplicate seed's twin cell would stay empty for
    * every Lloyd iteration).
    */
  private[graft] def distinctSeeds(cands: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    cands.iterator.takeWhile(_ => out.length < k).foreach { c =>
      if (seen.add(c.toSeq)) out += c
    }
    require(out.nonEmpty, "k-means init: no training vectors")
    var j = 0
    while (out.length < k) {
      val base = out(j % out.length)
      val jit = base.zipWithIndex.map { case (x, i) =>
        x + 1e-4 * (j + 1) * (if (i % 2 == 0) 1 else -1)
      }
      if (seen.add(jit.toSeq)) out += jit
      j += 1
    }
    out.toArray
  }

  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 3,
                      maxTrain: Long = 100000L): Array[Array[Double]] = {
    val v0 = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val total = v0.count()
    // cache the (sampled) training projection: every Lloyd iteration
    // re-reads it (init + iters scans), and at 100 TB the projection is
    // the id+vector slice of a bounded sample, not the full table
    val v = (if (total > maxTrain) v0.sample(maxTrain.toDouble / total, 42L) else v0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same distinct-seed discipline as pqCodebooks: duplicate early
    // vectors must not seed duplicate (hence permanently twinned) cells
    var centroids: Array[Array[Double]] = distinctSeeds(
      v.orderBy("id").limit(k * 4)
        .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray), k)
    for (_ <- 1 to iters) {
      // per-cell per-dimension means via posexplode + two-level agg;
      // assignment through the codegen'd graft_nearest_cells (codebook
      // embedded as a foldable literal — no UDF, no broadcast handle)
      val assigned = v.withColumn("cell", nearestCellsExpr(centroids, 1)(col("v"))(0))
      val dims = assigned.select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
        .groupBy("cell").agg(
          org.apache.spark.sql.functions.map_from_arrays(
            collect_list(col("pos")), collect_list(col("m"))).as("dims"))
        .collect()
      val next = centroids.clone()
      dims.foreach { r =>
        val cell = r.getInt(0)
        val m = r.getMap[Int, Double](1)
        next(cell) = Array.tabulate(centroids(cell).length)(i => m.getOrElse(i, 0.0))
      }
      centroids = next
    }
    v.unpersist(blocking = false)
    centroids
  }

  /** Codegen'd `n`-nearest-centroid assignment through the native
    * `graft_nearest_cells` expression ([[graft.plans.NearestCellsF]],
    * registered by GraftExtensions) — identical distance arithmetic and
    * (distance, index) tie order to [[nearestCells]], so cell ids are
    * bit-equal (KernelPropsSpec); the codebook travels as a foldable
    * `array<array<double>>` literal, so the whole assign/probe stays
    * inside whole-stage codegen with no UDF serialization and no
    * broadcast handle to manage. */
  private[graft] def nearestCellsExpr(cents: Array[Array[Double]], n: Int)(v: Column): Column =
    call_function("graft_nearest_cells", v,
      typedLit(cents.map(_.toSeq).toSeq), lit(n))

  /** Indices of the `n` nearest centroids by L2 distance. */
  private[graft] def nearestCells(vec: Seq[Float], cents: Array[Array[Double]],
                                  n: Int): Seq[Int] =
    cents.indices.map { c =>
      var d = 0.0; var i = 0
      val ct = cents(c)
      while (i < ct.length) {
        val diff = vec(i).toDouble - ct(i); d += diff * diff; i += 1
      }
      (d, c)
    }.sortBy(x => (x._1, x._2)).take(n).map(_._2)

  /** IVF-style ANN: corpus quantized to coarse cells (the LSH bucket
    * doubles as the inverted-file cell id); queries probe their own cell
    * plus `nprobe-1` sibling cells (bit flips) for better recall.
    */
  /** True IVF top-k: k-means codebook cells, queries probe their
    * `nprobe` nearest cells. Recall/cost tuned by (nCells, nprobe);
    * cells shard the corpus so per-cell scans stay bounded at scale.
    */
  def ivfKmeansTopK(queries: DataFrame, corpus: DataFrame,
                    queryId: String, corpusId: String, vecCol: String,
                    k: Int, nCells: Int = 16, nprobe: Int = 3,
                    iters: Int = 3): DataFrame = {
    val cents = kmeansCentroids(corpus, corpusId, vecCol, nCells, iters)
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv"),
      nearestCellsExpr(cents, 1)(col(vecCol))(0).as("cell"))
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
      explode(nearestCellsExpr(cents, nprobe)(col(vecCol))).as("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineExpr(col("qv"), col("cv")).as("cosine"))
      .distinct()
    topKSelect(scored, k)
  }

  // --------------------------------- product quantization (PQ + ADC)

  /** Train per-subspace PQ codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search" — public paper): the
    * vector splits into `m` coordinate blocks of d/m dims; each block
    * gets its own `k`-codeword k-means codebook (reusing
    * [[kmeansCentroids]] — bounded seeded training sample, Lloyd
    * iterations as DataFrame aggregations). The model is m·k·(d/m)
    * doubles — driver-tiny at any corpus size.
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, k: Int = 16, iters: Int = 3,
                  maxTrain: Long = 100000L): Array[Array[Array[Double]]] = {
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    // ALL m subspaces train together: one bounded seeded sample, one
    // init collect, and ONE aggregation job per Lloyd iteration (the
    // per-subspace formulation ran count+sample+3 iterations × m — ~80
    // driver-scheduled jobs at m=16, which DOMINATED q92/q93 wall time
    // at every factor of the r13 scale curve). Per-row work is
    // unchanged: each subspace's assignment is a slice against its own
    // foldable codebook literal; the dim explode happens once with
    // subspace = pos div dsub.
    val v0 = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val total = v0.count()
    val v = (if (total > maxTrain) v0.sample(maxTrain.toDouble / total, 42L) else v0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init: over-collect candidates and take the first k DISTINCT
    // slices per subspace — duplicate early rows would otherwise seed
    // duplicate codewords (ties assign to the lower index, leaving the
    // higher-index twin permanently empty). Falls back to deterministic
    // jitter when the sample has < k distinct slices in a subspace.
    val initRows = v.orderBy("id").limit(k * 4).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => distinctSeeds(
        initRows.map(r => r.slice(s * dsub, (s + 1) * dsub)), k))
    for (_ <- 1 to iters) {
      val cells = array((0 until m).map { s =>
        nearestCellsExpr(books(s), 1)(slice(col("v"), s * dsub + 1, dsub))(0)
      }: _*)
      val dims = v.select(cells.as("cells"), posexplode(col("v")))
        .select(col("cells"), expr(s"pos div $dsub").cast("int").as("s"),
          pmod(col("pos"), lit(dsub)).as("p"), col("col"))
        .withColumn("cell", element_at(col("cells"), col("s") + 1))
        .groupBy("s", "cell", "p").agg(avg(col("col")).as("mean"),
          count(lit(1)).as("cnt"))
        .collect()
      val next = books.map(_.map(_.clone()))
      val counts = Array.fill(m, k)(0L)
      dims.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
        counts(r.getInt(0))(r.getInt(1)) = r.getLong(4)
      }
      // re-seed cells that attracted no points: split the most
      // populated cell in that subspace (its centroid plus a small
      // deterministic offset) so the codebook never silently shrinks.
      // Driver-side, no extra job — the alternative (re-seed from the
      // farthest point) costs one aggregation per subspace per
      // iteration, against the bounded-job-count design.
      for (s <- 0 until m; c <- 0 until k if counts(s)(c) == 0L) {
        val big = counts(s).indices.maxBy(counts(s)(_))
        next(s)(c) = next(s)(big).zipWithIndex.map { case (x, i) =>
          x + 1e-4 * (c + 1) * (if (i % 2 == 0) 1 else -1)
        }
      }
      books = next
    }
    v.unpersist(blocking = false)
    books
  }

  /** Encode the corpus against trained codebooks: per-subspace
    * nearest-codeword ids (one byte each at k ≤ 256 — at d=64, m=8
    * that is 8 bytes vs 256 bytes of float32, 32× compression: the
    * reason a 100 TB embedding corpus can live in executor memory as
    * codes) plus the reconstruction norm the ADC cosine divides by
    * (subspaces are disjoint coordinate blocks, so |x̂|² = Σ_s |cw_s|²,
    * precomputed per codeword and looked up as a foldable literal).
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[Array[Double]]],
               passthrough: Seq[String] = Nil): DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    val codes = array((0 until m).map { s =>
      nearestCellsExpr(books(s), 1)(slice(col(vecCol), s * dsub + 1, dsub))(0)
    }: _*)
    val norms = (0 until m).map { s =>
      typedLit(books(s).map(cw => cw.map(x => x * x).sum).toSeq)
    }
    val rnorm2 = (0 until m).map(s =>
      element_at(norms(s), col("codes")(s) + 1)).reduce(_ + _)
    // passthrough: extra columns carried into the encoded frame in the
    // SAME projection (IVFPQ's cell + exact norm) — attaching them
    // post-hoc would be a full corpus self-join
    corpus.select((col(idCol) +: passthrough.map(col)) :+ codes.as("codes"): _*)
      .withColumn("rnorm", sqrt(rnorm2))
  }

  /** PQ ANN top-k with asymmetric-distance shortlist and exact
    * re-rank: the ADC pass scores every CODE row (8 bytes each, no
    * float vectors move — a broadcast of the query panel against the
    * compressed corpus, shuffle-free and whole-stage-codegen'd via a
    * zip_with/aggregate fold per subspace), keeps `k·rerank`
    * candidates per query, then re-reads ONLY those candidates'
    * true vectors for an exact cosine re-rank. Returned cosines are
    * therefore EXACT (oracle-verifiable, the q42 pattern) while the
    * scan cost rides the 32×-compressed representation. Compose with
    * [[ivfKmeansTopK]]'s cells (encode per cell, probe nprobe cells)
    * when even the compressed full scan is too much — the classic
    * IVFPQ layout.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
             queryId: String, corpusId: String, vecCol: String,
             k: Int, m: Int = 8, codewords: Int = 16,
             rerank: Int = 4, iters: Int = 3,
             maxTrain: Long = 16384L): DataFrame = {
    // maxTrain bounds codebook training INDEPENDENT of corpus size:
    // 16k vectors give ~1k training points per codeword per subspace
    // at the default (m, codewords) — sampling past that buys nothing
    // (PqProbe recall flat), while training on the corpus would make
    // the Lloyd aggregations scale with the data
    val books = pqCodebooks(corpus, corpusId, vecCol, m, codewords, iters, maxTrain)
    val dsub = books(0)(0).length
    val enc = pqEncode(corpus, corpusId, vecCol, books)
      .withColumnRenamed(corpusId, "neighbor_id")
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qnorm"))
    val adc = (0 until m).map { s =>
      val sub = slice(col("qv"), s * dsub + 1, dsub)
      val cb = typedLit(books(s).map(_.toSeq).toSeq)
      aggregate(
        zip_with(sub, element_at(cb, col("codes")(s) + 1), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
    }.reduce(_ + _)
    val shortlist = enc.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (adc / (col("qnorm") * col("rnorm"))).as("cosine"))
    val cand = topKSelect(shortlist, k * rerank)
      .select(col("query_id"), col("neighbor_id"))
    val exact = cand
      .join(queries.select(col(queryId).as("query_id"), col(vecCol).as("qv")),
        "query_id")
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineExpr(col("qv"), col("cv")).as("cosine"))
    topKSelect(exact, k)
  }

  /** IVFPQ: the coarse k-means cells of [[ivfKmeansTopK]] composed
    * with residual product quantization — the classic billion-scale
    * layout (Jégou et al. 2011 §IV). Each corpus vector is assigned to
    * its nearest coarse cell and only the RESIDUAL x − c(cell) is
    * PQ-encoded (residuals are smaller and better centered than raw
    * vectors, so the same codebook budget quantizes finer). Queries
    * probe `nprobe` cells; the shortlist score is a true cosine
    * approximation
    *
    *   (⟨q, c⟩ + ⟨q, r̂⟩) / (|q| · |x|)
    *
    * with ⟨q, c⟩ exact per probed cell, ⟨q, r̂⟩ the per-subspace ADC
    * fold, and |x| the EXACT vector norm stored at encode time (one
    * float per row — the codes stay the compressed payload). The
    * cell equi-join prunes the scan to the probed inverted lists;
    * the exact re-rank then makes returned cosines oracle-exact,
    * as in [[pqTopK]].
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                queryId: String, corpusId: String, vecCol: String,
                k: Int, nCells: Int = 16, nprobe: Int = 3,
                m: Int = 16, codewords: Int = 16,
                rerank: Int = 8, iters: Int = 3,
                maxTrain: Long = 16384L): DataFrame = {
    // both quantizers train on the same bounded sample budget — see
    // pqTopK's maxTrain note
    val cents = kmeansCentroids(corpus, corpusId, vecCol, nCells, iters, maxTrain)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    def residual(v: Column, cell: Column): Column =
      zip_with(v, element_at(centsLit, cell + 1), (x, c) => x - c)
        .cast("array<float>")
    // corpus side: cell assignment, residual, exact norm — the cached
    // frame carries ONLY (id, cell, xnorm, rv): the raw vector is not
    // needed downstream (the exact re-rank reads the corpus directly),
    // and cell/xnorm ride pqEncode's passthrough so no corpus self-join
    // re-attaches them (both were measured scale costs in the r13 curve)
    val assigned = graft.dsl.Rel.track(
      corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv"),
          nearestCellsExpr(cents, 1)(col(vecCol))(0).as("cell"))
        .select(col("neighbor_id"), col("cell"), norm(col("cv")).as("xnorm"),
          residual(col("cv"), col("cell")).as("rv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val books = pqCodebooks(assigned, "neighbor_id", "rv", m, codewords, iters, maxTrain)
    val dsub = books(0)(0).length
    val enc = pqEncode(assigned, "neighbor_id", "rv", books,
      passthrough = Seq("cell", "xnorm"))
    // query side: one row per probed cell with the exact ⟨q, c⟩ term
    val q = queries
      .select(col(queryId).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qnorm"),
        explode(nearestCellsExpr(cents, nprobe)(col(vecCol))).as("cell"))
      .withColumn("qc_dot",
        aggregate(zip_with(col("qv"), element_at(centsLit, col("cell") + 1),
          (x, c) => x * c), lit(0.0), (acc, v) => acc + v))
    val adcResid = (0 until m).map { s =>
      val sub = slice(col("qv"), s * dsub + 1, dsub)
      val cb = typedLit(books(s).map(_.toSeq).toSeq)
      aggregate(
        zip_with(sub, element_at(cb, col("codes")(s) + 1), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
    }.reduce(_ + _)
    val shortlist = broadcast(q).join(enc, Seq("cell")) // inverted-list pruning
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        ((col("qc_dot") + adcResid) / (col("qnorm") * col("xnorm"))).as("cosine"))
    val cand = topKSelect(shortlist, k * rerank)
      .select(col("query_id"), col("neighbor_id")).distinct()
    val exact = cand
      .join(queries.select(col(queryId).as("query_id"), col(vecCol).as("qv")),
        "query_id")
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineExpr(col("qv"), col("cv")).as("cosine"))
    topKSelect(exact, k)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              queryId: String, corpusId: String, vecCol: String,
              k: Int, planes: Int = 6, nprobe: Int = 3): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("cv"),
      bucketExpr(planes)(col(vecCol)).as("cell"))
    // probe cells: own bucket plus single-bit flips (deterministic
    // order). The bucket is projected ONCE and the lambda references
    // the attribute — capturing bucketExpr inline would re-hash the
    // vector per probe.
    val probes = transform(sequence(lit(0), lit(nprobe - 1)), p =>
      when(p === 0, col("own_cell"))
        .otherwise(col("own_cell").bitwiseXOR(call_function("shiftleft", lit(1L), p - 1))))
    val q = queries
      .select(col(queryId).as("query_id"), col(vecCol).as("qv"),
        bucketExpr(planes)(col(vecCol)).as("own_cell"))
      .select(col("query_id"), col("qv"), explode(probes).as("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineExpr(col("qv"), col("cv")).as("cosine"))
      .distinct()
    topKSelect(scored, k)
  }
}
