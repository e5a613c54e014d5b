package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Dumps `.explain("formatted")` plans to `plans/<round>/<name>_<tag>.txt`
  * for the optimization-round evidence trail (the judge cannot run Spark
  * and checks plan claims against these files).
  *
  * Two kinds of dumps:
  *  - the returned DataFrame of a declared query (meaningful for lazy
  *    queries like q122 whose returned frame carries the whole plan);
  *  - named INTERNAL shapes for the eager self-verifying capstones
  *    (q126–q132 return a LocalRelation of booleans — their real plans
  *    live inside the query body), reconstructed here against the same
  *    fixtures the queries build.
  *
  * Usage: runMain graft.tools.PlanDump <tag> <outDir> [names...]
  * (names default to the full interesting set).
  */
object PlanDump {

  private def fmt(df: DataFrame): String = {
    val qe = df.queryExecution
    qe.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  /** Internal shapes for the eager capstones: name -> builder. */
  private def internalShapes(s: SparkSession, dir: String)
      : Seq[(String, () => DataFrame)] = {
    import graft.llm.{Curate, Dedup}
    val ML = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def docs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    Seq(
      // ONE incrementalCurate call against materialized in-session
      // stores — the per-round body of q128/q130 and the twin in
      // q129/q131
      "incremental_curate_insession" -> (() => {
        val d = docs
        val evens = d.filter(pmod(col("doc_id"), lit(2)) === 0).persist(ML)
        evens.count()
        val fpStore = evens.select(xxhash64(col("text")).as("fp_a"),
          xxhash64(lit("graft-fp2"), col("text")).as("fp_b")).persist(ML)
        val sigStore = Dedup.minhashSignatures(evens, "doc_id", "text").persist(ML)
        fpStore.count(); sigStore.count()
        Curate.incrementalCurate(
          d.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
          fpStore, sigStore)
      }),
      // the set-equality verification shape used by the capstones'
      // parity booleans (q127 sameAsSig, q128 idxMatches, q129 parity,
      // q130 invariant, q131 parity, q132 idxParity/flatParity)
      "multiset_equality_check" -> (() => {
        val d = docs
        val a = Dedup.minhashSignatures(
          d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
        val b = Dedup.minhashSignatures(
          d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
        graft.queries.QCommon.multisetDiff(a.select(col("id")), b.select(col("id")))
      }),
      // the OLD two-sided form, one side of it (the other side is the
      // mirror image): what each parity boolean used to run TWICE
      "exceptall_pair_oldform" -> (() => {
        val d = docs
        val a = Dedup.minhashSignatures(
          d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
        val b = Dedup.minhashSignatures(
          d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
        a.select(col("id")).exceptAll(b.select(col("id")))
      }),
      // r22: the q125 prefix-sum verification, old ONE-PARTITION form —
      // Window.orderBy with no partitionBy (the VERDICT r21 scale-killer:
      // a single task sorts and scans every chunk row at 100 TB)
      "token_pack_prefix_oldform" -> (() => {
        val packed = tokenPacked(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("doc"), col("chunk_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        packed.withColumn("cum2", sum(col("n_tokens")).over(w))
          .filter(col("cum2") =!= col("cum_tokens"))
      }),
      // r22: the shipped replacement — per-doc PARTITIONED window plus
      // doc offsets from Rank.prefixSum over the doc totals (the 2-pass
      // stitch); boolean-identical, no single-partition Window anywhere
      "token_pack_prefix_check" -> (() => {
        val packed = tokenPacked(s, dir)
        val wd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc")).orderBy(col("chunk_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val docTotals = packed.groupBy(col("doc"))
          .agg(sum(col("n_tokens")).as("graft_dt"))
        val docOffsets = graft.ops.Rank.prefixSum(docTotals,
            Seq(col("doc")), "graft_dt", "graft_cum_dt")
          .select(col("doc"),
            (col("graft_cum_dt") - col("graft_dt")).as("graft_doc_off"))
        packed.withColumn("graft_cum_in_doc", sum(col("n_tokens")).over(wd))
          .join(docOffsets, Seq("doc"))
          .filter(col("graft_doc_off") + col("graft_cum_in_doc")
            =!= col("cum_tokens"))
      }),
      // r22: the q92/q93 ANN pipelines (their declared queries return
      // one-row LocalRelations; the real plan is the shortlist+re-rank
      // frame). Training actions run while BUILDING the frame — the
      // dump prices the distributed shape only.
      "pq_topk_pipeline" -> (() => {
        val v = graft.Tables.load(s, dir, "embeddings")
        graft.llm.Similarity.pqTopK(v.filter(col("vec_id") < 10), v,
          "vec_id", "vec_id", "embedding", k = 5,
          m = 16, codewords = 16, rerank = 8)
      }),
      "ivfpq_topk_pipeline" -> (() => {
        val v = graft.Tables.load(s, dir, "embeddings")
        graft.llm.Similarity.ivfPqTopK(v.filter(col("vec_id") < 10), v,
          "vec_id", "vec_id", "embedding", k = 5,
          nCells = 16, nprobe = 4, m = 16, codewords = 16, rerank = 8)
      })
    )
  }

  /** The q125 packed frame (persisted, as the query builds it) — shared
    * by the two prefix-check shape dumps above. */
  private def tokenPacked(s: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.load(s, dir, "documents")
    val merges = graft.llm.Bpe.train(d, "text", numMerges = 200)
    graft.llm.Curate.tokenPack(d, "doc_id", "text", merges,
        chunkWords = 12, stride = 8, seqTokens = 256L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val outDir = args.drop(1).headOption.getOrElse("plans/r21")
    val names = args.drop(2).toSeq
    val spark = graft.Graft.localSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "plandump")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLANDUMP_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val defaults = Seq("q122_pagerank", "q118_quality_classifier",
      "q119_incremental_lsh", "q125_token_pack", "q96_collected_group",
      "q111_heavy_hitters", "q121_bm25", "q98_semdedup")
    val wanted = if (names.nonEmpty) names else defaults
    wanted.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try {
          val df = fn(spark, dir)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), fmt(df))
          println(s"[plandump] wrote $outDir/${n}_$tag.txt")
        } catch {
          case t: Throwable =>
            println(s"[plandump] FAILED $n: ${t.getMessage}")
        }
        spark.catalog.clearCache()
        graft.dsl.Rel.releaseTracked()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    if (names.isEmpty || names.contains("internal")) {
      internalShapes(spark, dir).foreach { case (n, mk) =>
        try {
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), fmt(mk()))
          println(s"[plandump] wrote $outDir/${n}_$tag.txt")
        } catch {
          case t: Throwable =>
            println(s"[plandump] FAILED $n: ${t.getMessage}")
        }
        spark.catalog.clearCache()
        graft.dsl.Rel.releaseTracked()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
