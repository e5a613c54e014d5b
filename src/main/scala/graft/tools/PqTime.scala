package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** One-off stage-timing probe for q92/q93 (VERDICT r13 task 4): where
  * do the seconds go — training, encode+ADC shortlist, or re-rank?
  */
object PqTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.localSession(32, "pq-time")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val v = graft.Tables.load(spark, dir, "embeddings")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PQTIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("PQTIME corpus rows " + v.count())
    for (_ <- 1 to 2) {
      val books = t("pq_codebooks") {
        Similarity.pqCodebooks(v, "vec_id", "embedding", m = 16, k = 16, iters = 3, maxTrain = 16384L)
      }
      t("pq_full_q92") {
        Similarity.pqTopK(v.filter(col("vec_id") < 10), v, "vec_id", "vec_id", "embedding",
          k = 5, m = 16, codewords = 16, rerank = 8).count()
      }
      t("kmeans_coarse") {
        Similarity.kmeansCentroids(v, "vec_id", "embedding", 16, 3, 16384L)
      }
      t("ivfpq_full_q93") {
        Similarity.ivfPqTopK(v.filter(col("vec_id") < 10), v, "vec_id", "vec_id", "embedding",
          k = 5, nCells = 16, nprobe = 4, m = 16, codewords = 16, rerank = 8).count()
      }
      spark.catalog.clearCache()
      graft.dsl.Rel.releaseTracked()
    }
    spark.stop()
  }
}
