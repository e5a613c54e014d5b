package graft

import org.apache.spark.sql.functions._
import graft.llm.{Similarity, VectorIndex}

/** Persisted IVF vector index (r20): build → append → query lifecycle
  * against the bucketed index TABLE + one-row codebook manifest. The
  * load-bearing assertions: append assigns under the MANIFEST
  * centroids (bit-identical to what build would have assigned — the
  * parity that makes appends safe without retraining), the indexed
  * query equals the in-session flat twin on the same codebook (the
  * table round-trip preserves vectors and cells exactly), per-cell
  * maintenance aggregation is Exchange-free on the bucketed index,
  * the manifest/index version cross-check turns the rebuild crash
  * window into a loud failure, and every wrong-wiring shape fails
  * before corpus-sized work. */
class VectorIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }
  private def drop(pre: String, extra: String*): Unit =
    (Seq("idx", "man").map(s => s"${pre}_$s") ++ extra)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("build/append/query: append assigns under manifest centroids; indexed query == flat twin") {
    val p = "gvi_a"
    drop(p)
    try {
      val all = corpus(80, 16, seed = 7).persist()
      all.count()
      val first = all.filter($"vec_id" % 2 === 0)
      val rest = all.filter($"vec_id" % 2 === 1)
      VectorIndex.build(first, "vec_id", "embedding", nCells = 4,
        s"${p}_idx", s"${p}_man", buckets = 2, iters = 2)
      VectorIndex.append(rest, "vec_id", "embedding", s"${p}_idx", s"${p}_man")
      // index == assign(full corpus) under the MANIFEST centroids —
      // the append path used the same codebook the build persisted
      val (cents, ver) = VectorIndex.loadManifest(spark, s"${p}_man", "spec")
      assert(ver == 1L) // first auto-versioned build
      val expect = VectorIndex.assign(all, "vec_id", "embedding", cents, ver)
      val idx = spark.table(s"${p}_idx")
      assert(idx.exceptAll(expect).count() == 0L &&
        expect.exceptAll(idx).count() == 0L)
      // indexed probe == the same probe run in-session on the same
      // codebook (table round-trip exact for float vectors + int cells)
      val queries = all.filter($"vec_id" < 5)
      val got = VectorIndex.query(queries, "vec_id", "embedding",
        s"${p}_idx", s"${p}_man", k = 3, nprobe = 2)
      val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"),
        explode(Similarity.nearestCellsExpr(cents, 2)($"embedding")).as("cell"))
      val flat = expect.select($"cell", $"id".as("neighbor_id"), $"vec".as("cv"))
      val twin = Similarity.topKSelect(
        q.join(flat, Seq("cell"))
          .filter($"query_id" =!= $"neighbor_id")
          .select($"query_id", $"neighbor_id",
            Similarity.cosineExpr($"qv", $"cv").as("cosine")), 3)
      assert(got.exceptAll(twin).count() == 0L &&
        twin.exceptAll(got).count() == 0L)
      // shape: 5 queries × k rows, rk 1..3
      assert(got.count() == 15L &&
        got.groupBy($"query_id").agg(countDistinct($"rk").as("n"))
          .filter($"n" =!= 3).count() == 0L)
      all.unpersist()
    } finally drop(p)
  }

  test("per-cell maintenance aggregation is Exchange-free; probes bucket-prune the scan") {
    val p = "gvi_z"
    drop(p)
    try {
      VectorIndex.build(corpus(40, 8, seed = 3), "vec_id", "embedding",
        nCells = 4, s"${p}_idx", s"${p}_man", buckets = 4, iters = 1)
      val plan = spark.table(s"${p}_idx").groupBy($"cell")
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1500))
      // the probe's index scan reads ONLY the buckets holding probed
      // cells (the collected-cells In filter → bucket pruning): one
      // query at nprobe=1 probes 1 of 4 cells
      val pruned = VectorIndex.query(corpus(1, 8, seed = 4), "vec_id",
        "embedding", s"${p}_idx", s"${p}_man", k = 2, nprobe = 1)
      val qplan = pruned.queryExecution.executedPlan.toString
      assert(qplan.contains("SelectedBucketsCount: 1 out of 4"),
        qplan.take(2000))
    } finally drop(p)
  }

  test("Bucketed.compact is the index's file-count maintenance: files collapse, probes unchanged") {
    val p = "gvi_c"
    drop(p)
    try {
      val all = corpus(60, 8, seed = 11).persist()
      all.count()
      VectorIndex.build(all.filter($"vec_id" % 3 === 0), "vec_id", "embedding",
        nCells = 4, s"${p}_idx", s"${p}_man", buckets = 2, iters = 1)
      VectorIndex.append(all.filter($"vec_id" % 3 === 1), "vec_id",
        "embedding", s"${p}_idx", s"${p}_man")
      VectorIndex.append(all.filter($"vec_id" % 3 === 2), "vec_id",
        "embedding", s"${p}_idx", s"${p}_man")
      def files(): Long = {
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            spark.sessionState.sqlParser.parseTableIdentifier(s"${p}_idx")).location)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(loc).count(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet")).toLong
      }
      val queries = all.filter($"vec_id" < 4)
      val before = VectorIndex.query(queries, "vec_id", "embedding",
        s"${p}_idx", s"${p}_man", k = 3, nprobe = 2).localCheckpoint()
      // each write emits (tasks × touched buckets) files, so the count
      // accumulates well past the bucket count — the condition compact
      // exists to repair
      assert(files() > 2L, s"files=${files()}")
      graft.ops.Bucketed.compact(spark, s"${p}_idx")
      assert(files() == 2L) // one file per bucket restored
      // version column survives the rewrite; probes identical
      val after = VectorIndex.query(queries, "vec_id", "embedding",
        s"${p}_idx", s"${p}_man", k = 3, nprobe = 2)
      assert(after.exceptAll(before).count() == 0L &&
        before.exceptAll(after).count() == 0L)
      all.unpersist()
    } finally drop(p)
  }

  test("rebuild auto-bumps the version; a manifest/index version split fails loudly") {
    val p = "gvi_v"
    drop(p)
    try {
      val d = corpus(40, 8, seed = 5)
      VectorIndex.build(d, "vec_id", "embedding", nCells = 4,
        s"${p}_idx", s"${p}_man", buckets = 2, iters = 1)
      VectorIndex.build(d, "vec_id", "embedding", nCells = 4,
        s"${p}_idx", s"${p}_man", buckets = 2, iters = 1)
      val (_, ver2) = VectorIndex.loadManifest(spark, s"${p}_man", "spec")
      assert(ver2 == 2L) // rebuild-on-drift without caller state
      // simulate the crash window: a rebuild that died between its
      // index write and manifest write — here faked by doctoring the
      // manifest's version (the index still carries ver2)
      graft.ops.Bucketed.writePlain(
        // localCheckpoint: writePlain deletes the target before writing,
        // so a frame whose lineage SCANS the target must be severed first
        spark.table(s"${p}_man").withColumn("version", lit(3L))
          .localCheckpoint(), s"${p}_man")
      val e1 = intercept[IllegalArgumentException](VectorIndex.query(
        d.limit(2), "vec_id", "embedding", s"${p}_idx", s"${p}_man", k = 2))
      assert(e1.getMessage.contains("codebook version"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](VectorIndex.append(
        d.limit(2), "vec_id", "embedding", s"${p}_idx", s"${p}_man"))
      assert(e2.getMessage.contains("codebook version"), e2.getMessage)
      // recovery is the documented one: rebuild — and it heals
      VectorIndex.build(d, "vec_id", "embedding", nCells = 4,
        s"${p}_idx", s"${p}_man", buckets = 2, iters = 1)
      assert(VectorIndex.query(d.limit(2), "vec_id", "embedding",
        s"${p}_idx", s"${p}_man", k = 2).count() > 0L)
    } finally drop(p)
  }

  test("wrong wiring fails loudly before corpus-sized work") {
    val p = "gvi_w"
    drop(p, s"${p}_man2", s"${p}_idx2", s"${p}_man3")
    try {
      val d = corpus(40, 8, seed = 9)
      VectorIndex.build(d, "vec_id", "embedding", nCells = 4,
        s"${p}_idx", s"${p}_man", buckets = 2, iters = 1)
      // dim mismatch: embedded under a different model
      val e1 = intercept[IllegalArgumentException](VectorIndex.append(
        corpus(4, 16, seed = 1), "vec_id", "embedding", s"${p}_idx", s"${p}_man"))
      assert(e1.getMessage.contains("dim"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](VectorIndex.query(
        corpus(2, 16, seed = 2), "vec_id", "embedding",
        s"${p}_idx", s"${p}_man", k = 2))
      assert(e2.getMessage.contains("dim"), e2.getMessage)
      // a NULL probed vector gets the same loud diagnosis, not an NPE
      // (r20 ADVICE: size(null) is null and the unguarded getInt threw)
      val nullVec = Seq((0L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding")
      val e2b = intercept[IllegalArgumentException](VectorIndex.query(
        nullVec, "vec_id", "embedding", s"${p}_idx", s"${p}_man", k = 2))
      assert(e2b.getMessage.contains("null vector"), e2b.getMessage)
      // missing index table
      val e3 = intercept[IllegalArgumentException](VectorIndex.append(
        d, "vec_id", "embedding", s"${p}_missing", s"${p}_man"))
      assert(e3.getMessage.contains("does not exist"), e3.getMessage)
      // manifest with two rows: the one-row invariant
      spark.table(s"${p}_man").unionAll(spark.table(s"${p}_man"))
        .write.format("parquet").saveAsTable(s"${p}_man2")
      val e4 = intercept[IllegalArgumentException](VectorIndex.query(
        d, "vec_id", "embedding", s"${p}_idx", s"${p}_man2", k = 2))
      assert(e4.getMessage.contains("exactly one row"), e4.getMessage)
      // string ids refused at build time — BEFORE training or any
      // table mutation (the old index/manifest pair must be intact)
      val e5 = intercept[IllegalArgumentException](VectorIndex.build(
        d.select($"vec_id".cast("string").as("vec_id"), $"embedding"),
        "vec_id", "embedding", 4, s"${p}_idx2", s"${p}_man3", 2))
      assert(e5.getMessage.contains("integral"), e5.getMessage)
      assert(!spark.sessionState.catalog.tableExists(
        spark.sessionState.sqlParser.parseTableIdentifier(s"${p}_man3")))
      // ...and at query time for string QUERY ids (a silent cast would
      // group every query under NULL)
      val e6 = intercept[IllegalArgumentException](VectorIndex.query(
        d.select($"vec_id".cast("string").as("vec_id"), $"embedding"),
        "vec_id", "embedding", s"${p}_idx", s"${p}_man", k = 2))
      assert(e6.getMessage.contains("integral"), e6.getMessage)
    } finally drop(p, s"${p}_man2", s"${p}_idx2", s"${p}_man3")
  }
}
