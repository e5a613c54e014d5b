package graft.tools

import org.apache.spark.sql.functions._
import graft.{Graft, Tables}
import graft.llm.{Bpe, Curate, Text}

/** Stage decomposition for the q125 token-pack scale curve (r17): the
  * composed pipeline is train → chunk → per-chunk BPE tokenCount →
  * 2-pass prefix sum → bin assignment, and the 1×–64× curve showed a
  * super-linear step — this probe charges each stage separately on the
  * SAME multiplied corpus the curve uses, so the step has a named
  * owner (train's pair-count aggregations vs the chunk explode vs the
  * encode kernel vs the range-sort prefix sum).
  */
object TokenPackProbe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
  }

  private def multiply(base: org.apache.spark.sql.DataFrame, m: Int) =
    (1 until m).map { c =>
      base.select((col("doc_id") + c.toLong * 10000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"x${c}_"), w))).as("text"))
    }.foldLeft(base.select(col("doc_id"), col("text")))(_ union _)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption.getOrElse("16,64")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Graft.localSession(cpus, "tokenpack-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, dir, "documents")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (m <- factors) {
      val docs = multiply(base, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()
      for (iter <- 1 to 2) {
        val (tTrain, merges) = time(Bpe.train(docs, "text", numMerges = 200))
        val (tChunk, nChunks) = time(
          Text.chunk(docs.filter(col("text").isNotNull),
            "doc_id", "text", 12, 8).count())
        val chunks = Text.chunk(docs.filter(col("text").isNotNull),
            "doc_id", "text", 12, 8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        chunks.count()
        val (tEncode, tokSum) = time(
          chunks.select(Bpe.tokenCount(col("chunk_text"), merges).as("nt"))
            .agg(sum(col("nt"))).head().getLong(0))
        val withCounts = chunks.select(col("doc"), col("chunk_id"),
            Bpe.tokenCount(col("chunk_text"), merges).as("n_tokens"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        withCounts.count()
        val (tPrefix, nBins) = time(
          graft.ops.Rank.prefixSum(withCounts,
              Seq(col("doc"), col("chunk_id")), "n_tokens", "cum_tokens")
            .withColumn("bin", expr("(cum_tokens - n_tokens) div 256L"))
            .agg(countDistinct(col("bin"))).head().getLong(0))
        val (tFull, _) = time(
          Curate.tokenPack(docs, "doc_id", "text", merges)
            .agg(countDistinct(col("bin"))).head().getLong(0))
        chunks.unpersist(); withCounts.unpersist()
        println(f"TOKENPACK factor=$m iter=$iter n=$n nChunks=$nChunks " +
          f"tokSum=$tokSum nBins=$nBins train=${tTrain}%.2f " +
          f"chunk=${tChunk}%.2f encode=${tEncode}%.2f " +
          f"prefix=${tPrefix}%.2f fullNoTrain=${tFull}%.2f")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
