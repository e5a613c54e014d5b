package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Bpe, Dedup}

/** Operator-only bench slices for the composed SELF-VERIFYING queries
  * (r17 VERDICT task 4): q120/q125/q126/q127/q128-style entries run
  * their operator PLUS an in-query oracle (property recomputes,
  * equality checks against a second path, multi-store fixtures), so
  * the headline per-query seconds price verification work as operator
  * cost — q127's 5.57 s artifact row was ~1.5 s of operator by the
  * r17 A/B. Bench measures these slices in a separate pass and emits
  * them as `operator_sec`, so artifact readers (and the 2×-bar
  * arithmetic) can read the operator's true cost without losing the
  * composed query's verification value.
  *
  * Contract per entry: the OUTER call does all FIXTURE work
  * (store/index construction, persists, counts — untimed), and
  * returns (thunk, cleanup). Bench times ONLY the thunk — the
  * operator run the production user pays per batch — and calls
  * cleanup once after the timed iterations. Fixtures use plain
  * persist() (never Rel.track) so the per-iteration
  * Rel.releaseTracked() frees operator internals without dropping
  * fixtures mid-measurement.
  */
object OperatorSlices {
  /** (thunk to time, cleanup after all iterations) */
  type Slice = (SparkSession, String) => (() => Long, () => Unit)

  private val ML = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def docs(s: SparkSession, dir: String): DataFrame =
    QCommon.t(s, dir, "documents").select(col("doc_id"), col("text"))

  /** The q119/q126/q127 fixture: store side = even ids, batch = odd
    * ids + re-ingested evens under fresh ids. The copy-id base is
    * DERIVED from the data (`max(doc_id) + 1`), never a hardcoded
    * constant (r18 VERDICT: the q128 driver query dropped its
    * `+ 1000000L` for exactly this reason — a salted/256× corpus
    * builds doc_id ≥ 1e6, and a constant base would alias copy ids
    * with real ids, corrupting the fixture). Guard test in
    * OperatorSlicesSpec. */
  private[queries] def evensBatch(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir)
    val evens = d.filter(pmod(col("doc_id"), lit(2)) === 0).persist(ML)
    evens.count()
    val copyBase = QCommon.copyBase(d, "doc_id")
    val batch = d.filter(pmod(col("doc_id"), lit(2)) === 1)
      .unionByName(evens.select(
        (col("doc_id") + copyBase).as("doc_id"), col("text")))
      .persist(ML)
    batch.count()
    (evens, batch)
  }

  val slices: Map[String, Slice] = Map(
    // operator = ONE incremental LSH ingest against a materialized
    // signature store (q119 also re-joins texts for four invariant
    // checks — verification)
    "q119_incremental_lsh" -> ((s, dir) => {
      val (evens, batch) = evensBatch(s, dir)
      val store = Dedup.minhashSignatures(evens, "doc_id", "text").persist(ML)
      store.count()
      (() => Dedup.lshIncremental(batch, "doc_id", "text", store).count(),
        () => { store.unpersist(); evens.unpersist(); batch.unpersist(); () })
    }),

    // operator = sketch build + merge + 5 φ-reads (q120 also recomputes
    // every estimate's TRUE corpus rank with a full-corpus aggregation
    // — verification)
    "q120_quantile_sketch" -> ((s, dir) => {
      val li = QCommon.t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice")).persist(ML)
      li.count()
      val phis = Seq(0.01, 0.25, 0.50, 0.75, 0.99)
      (() => {
        val perGroup = graft.ops.QuantileSketch.sketchBy(
          li, Seq("l_returnflag"), col("l_extendedprice"))
        val global = graft.ops.QuantileSketch.mergeSketches(perGroup, Seq.empty)
        // CONSUME the estimates, never count() them: a bare count lets
        // ColumnPruning drop the unreferenced quantileAt projection and
        // then the KLL aggregates themselves, timing only a distinct
        // scan of the cached fixture — bench_r18_run1-4 recorded that
        // pruned plan as 0.06-0.08 s "operator" (r18 review). The sum
        // forces every φ-read and, through it, the sketch build+merge.
        val s = global.select(
            graft.ops.QuantileSketch.totalWeight(col("kll")).as("tw"),
            graft.ops.QuantileSketch.weightedItems(col("kll")).as("items"))
          .select(explode(array(phis.map(lit): _*)).as("phi"),
            col("items"), col("tw"))
          .select(graft.ops.QuantileSketch.quantileAt(
            col("items"), col("tw"), col("phi")).as("est"))
          .agg(sum(col("est"))).head().getDouble(0)
        if (s.isNaN) -1L else phis.size.toLong
      }, () => { li.unpersist(); () })
    }),

    // operator = chunk → BPE tokenCount → 2-pass prefix-sum packing;
    // merge TRAINING is model building (the ScaleCurve convention) and
    // the driver re-encode / windowed prefix recompute are verification
    "q125_token_pack" -> ((s, dir) => {
      val d = docs(s, dir).persist(ML)
      d.count()
      val merges = Bpe.train(d, "text", numMerges = 200)
      (() => graft.llm.Curate.tokenPack(d, "doc_id", "text", merges,
          chunkWords = 12, stride = 8, seqTokens = 256L).count(),
        () => { d.unpersist(); () })
    }),

    // operator = ONE incrementalCurate call against materialized
    // fingerprint + signature stores (q126 also derives gate counts and
    // five invariant joins — verification)
    "q126_incremental_curate" -> ((s, dir) => {
      val (evens, batch) = evensBatch(s, dir)
      val fpStore = evens.select(
        xxhash64(col("text")).as("fp_a"),
        xxhash64(lit("graft-fp2"), col("text")).as("fp_b")).persist(ML)
      val sigStore = Dedup.minhashSignatures(evens, "doc_id", "text").persist(ML)
      fpStore.count(); sigStore.count()
      (() => graft.llm.Curate.incrementalCurate(
          batch, "doc_id", "text", fpStore, sigStore).count(),
        () => { fpStore.unpersist(); sigStore.unpersist()
          evens.unpersist(); batch.unpersist(); () })
    }),

    // operator = ONE index-path ingest over a pre-built band index
    // (q127 additionally runs the WHOLE derivation path plus an
    // exceptAll equality check — the heaviest verification in the
    // suite; the r17 A/B put the operator at ~1.5 s of its 5.57 s row)
    "q127_incremental_lsh_indexed" -> ((s, dir) => {
      val (evens, batch) = evensBatch(s, dir)
      val store = Dedup.minhashSignatures(evens, "doc_id", "text").persist(ML)
      store.count()
      val idx = Dedup.lshBandIndex(store).persist(ML)
      idx.count()
      (() => Dedup.lshIncrementalIndexed(
          batch, "doc_id", "text", store, idx).count(),
        () => { store.unpersist(); idx.unpersist()
          evens.unpersist(); batch.unpersist(); () })
    }),

    // operator = the 3-round ingest LOOP itself (curate + the three
    // store appends per round, lineage cut at each append — the
    // production per-batch cost ×3); q128's re-ingest probes,
    // cross-round near/exact scans, index-equality exceptAll and
    // manifest-failure probe are verification
    "q128_ingest_loop" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).persist(ML)
      d.count()
      (() => {
        // empty stores derived through the operators (Curate.emptyStores
        // — one schema definition with the q128 query; r19 review).
        // r21 store discipline (mirrors the query): ONE localCheckpoint
        // per round — the admit frame — with the three stores as lazy
        // unions of its flat delta projections, instead of three
        // full-store re-materializations per round
        val (fp0, sig0, idx0) = graft.llm.Curate.emptyStores(d, "doc_id", "text")
        var fpStore: DataFrame = fp0
        var sigStore: DataFrame = sig0
        var bandIdx: DataFrame = idx0
        var total = 0L
        for (i <- 0 until 3) {
          val batch = d.filter(pmod(col("doc_id"), lit(3)) === i)
          val admitted = graft.llm.Curate.incrementalCurate(
              batch, "doc_id", "text", fpStore, sigStore,
              bandIndex = Some(bandIdx))
            .localCheckpoint()
          total += admitted.count()
          fpStore = fpStore.unionByName(admitted.select(col("fp_a"), col("fp_b")))
          sigStore = sigStore.unionByName(admitted.select(col("id"), col("sig")))
          bandIdx = bandIdx.unionByName(
            Dedup.lshBandIndex(admitted.select(col("id"), col("sig"))))
        }
        total
      }, () => { d.unpersist(); () })
    }),

    // operator = the DURABLE 3-round ingest loop (bootstrap empty
    // bucketed tables + per round: curate against the tables + the
    // three appendBucketed writes — the production per-batch cost ×3
    // including real table I/O); q129's in-session parity twin,
    // manifest probe, plan asserts and compact run are verification.
    // Tables are rebuilt inside the thunk (bootstrap is part of the
    // durable lifecycle and costs two empty writes); cleanup drops
    // them.
    "q129_ingest_loop_tables" -> ((s, dir) => {
      val d = docs(s, dir).persist(ML)
      d.count()
      val B = 4
      val Bk = graft.ops.Bucketed
      val tabs = Seq("g129s_fp", "g129s_sig", "g129s_idx")
      (() => {
        val (fp0, sig0, idx0) = graft.llm.Curate.emptyStores(d, "doc_id", "text")
        // concurrent bootstraps/appends — the shipped q129 shape (r22
        // single-definition rule: the slice prices what the query runs)
        QCommon.parJobs(
          tabs.zip(Seq((fp0, Seq("fp_a")), (sig0, Seq("id")), (idx0, Seq("band", "key"))))
            .map { case (tn, (df0, keys)) =>
              () => Bk.writeBucketed(df0, tn, keys, B) }: _*)
        var total = 0L
        for (i <- 0 until 3) {
          val batch = d.filter(pmod(col("doc_id"), lit(3)) === i)
          // localCheckpoint, NOT persist: the append refresh recaches
          // table-derived plans (the appendBucketed RMW hazard)
          val admitted = graft.llm.Curate.incrementalCurate(
              batch, "doc_id", "text", s.table("g129s_fp"), s.table("g129s_sig"),
              bandIndex = Some(s.table("g129s_idx")))
            .localCheckpoint()
          total += admitted.count()
          QCommon.parJobs(
            () => Bk.appendBucketed(admitted.select(col("fp_a"), col("fp_b")),
              "g129s_fp", Seq("fp_a"), B),
            () => Bk.appendBucketed(admitted.select(col("id"), col("sig")),
              "g129s_sig", Seq("id"), B),
            () => Bk.appendBucketed(
              Dedup.lshBandIndex(admitted.select(col("id"), col("sig"))),
              "g129s_idx", Seq("band", "key"), B))
        }
        total
      }, () => {
        tabs.foreach(tn => s.sql(s"DROP TABLE IF EXISTS $tn"))
        d.unpersist(); ()
      })
    }),

    // operator = the STREAMING foreachBatch body ×3 (Curate.ingestBatch:
    // ledger check + curate against the tables + the three
    // appendBucketed writes + ledger append — the per-trigger cost of
    // streamingIngest); q131's in-session parity twin, replay probes
    // and ledger-completeness assertions are verification. Bootstrap
    // (empty bucketed writes + manifest/ledger tables) is part of the
    // durable lifecycle, inside the thunk like q129's.
    "q131_streaming_ingest_replay" -> ((s, dir) => {
      val d = docs(s, dir).persist(ML)
      d.count()
      val B = 4
      val Bk = graft.ops.Bucketed
      val tabs = Seq("g131s_fp", "g131s_sig", "g131s_idx")
      (() => {
        val (fp0, sig0, idx0) = graft.llm.Curate.emptyStores(d, "doc_id", "text")
        // concurrent bootstraps — the shipped q131 shape (the trigger's
        // own appends stay sequential inside ingestBatch: replay order)
        QCommon.parJobs(
          tabs.zip(Seq((fp0, Seq("fp_a")), (sig0, Seq("id")), (idx0, Seq("band", "key"))))
            .map { case (tn, (df0, keys)) =>
              () => Bk.writeBucketed(df0, tn, keys, B) }: _*)
        s.sql("DROP TABLE IF EXISTS g131s_man")
        Dedup.lshManifest(s).write.format("parquet").saveAsTable("g131s_man")
        s.sql("DROP TABLE IF EXISTS g131s_led")
        var total = 0L
        for (i <- 0 until 3) {
          val batch = d.filter(pmod(col("doc_id"), lit(3)) === i)
          graft.llm.Curate.ingestBatch(batch, i.toLong, "doc_id", "text",
            "g131s_fp", "g131s_sig", "g131s_idx", B,
            manifestTable = Some("g131s_man"), ledgerTable = Some("g131s_led"),
            onAdmitted = (df, _) => total += df.count())
        }
        total
      }, () => {
        (tabs ++ Seq("g131s_man", "g131s_led"))
          .foreach(tn => s.sql(s"DROP TABLE IF EXISTS $tn"))
        d.unpersist(); ()
      })
    }),

    // operator = ONE split-invariant 3-batch ingest pass (q130 also
    // runs the one-batch twin, the equality exceptAll, and the
    // default-mode contrast pass — verification). Chain planting is
    // fixture work (untimed).
    "q130_split_invariant_ingest" -> ((s, dir) => {
      // the SAME fixture as the query, by construction (shared
      // QCommon.chainCorpus — duplicated fixture math is how
      // operator_sec ends up pricing a different operator than the
      // headline, the evensBatch lesson)
      val (corpus0, t1, t2, _, _, _) = QCommon.chainCorpus(s, dir)
      val corpus = corpus0.persist(ML)
      corpus.count()
      (() => {
        // r21 store discipline (mirrors the query): one localCheckpoint
        // per batch, stores as lazy delta unions
        val (fpE, sigE, _) = graft.llm.Curate.emptyStores(corpus, "doc_id", "text")
        var fp: DataFrame = fpE
        var sig: DataFrame = sigE
        var total = 0L
        Seq((Long.MinValue, t1), (t1, t2), (t2, Long.MaxValue)).foreach {
          case (lo, hi) =>
            val batch = corpus.filter(col("doc_id") >= lo && col("doc_id") < hi)
            val res = graft.llm.Curate.incrementalCurate(batch, "doc_id", "text",
                fp, sig, bands = 32, threshold = 0.45, splitInvariant = true)
              .localCheckpoint()
            total += res.filter(col("admitted")).count()
            fp = fp.unionByName(res.filter(col("admitted"))
              .select(col("fp_a"), col("fp_b")))
            sig = sig.unionByName(res.select(col("id"), col("sig")))
        }
        total
      }, () => { corpus.unpersist(); () })
    }),

    // operator = the persisted-index LIFECYCLE (VectorIndex.build on
    // half the embeddings + append of the other half + one k=5/nprobe=3
    // probe over the vec_id<10 queries); q132's parity twins,
    // annShapeCheck recompute and wrong-dim probe are verification.
    "q132_ivf_index" -> ((s, dir) => {
      val v = QCommon.t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).persist(ML)
      v.count()
      val VI = graft.llm.VectorIndex
      val tabs = Seq("g132s_idx", "g132s_man")
      (() => {
        VI.build(v.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id",
          "embedding", nCells = 16, "g132s_idx", "g132s_man", buckets = 4)
        VI.append(v.filter(pmod(col("vec_id"), lit(2)) === 1), "vec_id",
          "embedding", "g132s_idx", "g132s_man")
        VI.query(v.filter(col("vec_id") < 10), "vec_id", "embedding",
          "g132s_idx", "g132s_man", k = 5, nprobe = 3,
          excludeSelf = true).count()
      }, () => {
        tabs.foreach(tn => s.sql(s"DROP TABLE IF EXISTS $tn"))
        v.unpersist(); ()
      })
    })
  )
}
