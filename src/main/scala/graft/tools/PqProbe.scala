package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.Similarity
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.localSession(4, "pq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val _unused = ()
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val v = graft.Tables.load(spark, dir, "embeddings")
      val q = v.filter(col("vec_id") < 10)
      val k = 5
      val exact = Similarity.bruteForceTopK(q, v, "vec_id", "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      for ((m, cw, rerank) <- Seq((16, 16, 8))) {
        val pq = Similarity.pqTopK(q, v, "vec_id", "vec_id", "embedding", k, m = m, codewords = cw, rerank = rerank)
          .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val recalls = exact.map { case (qid, ex) => (pq.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
        println(f"PQPROBE dir=$dir m=$m cw=$cw rerank=$rerank mean_recall=${recalls.sum / recalls.size}%.3f min=${recalls.min}%.3f nq=${exact.size}")
      }
      for ((nprobe, rerank) <- Seq((3, 8), (4, 8), (6, 8))) {
        val ivfpq = Similarity.ivfPqTopK(q, v, "vec_id", "vec_id", "embedding", k,
            nCells = 16, nprobe = nprobe, m = 16, codewords = 16, rerank = rerank)
          .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val rec2 = exact.map { case (qid, ex) => (ivfpq.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
        println(f"IVFPQPROBE dir=$dir nprobe=$nprobe rerank=$rerank mean_recall=${rec2.sum / rec2.size}%.3f min=${rec2.min}%.3f")
      }
    }
    spark.stop()
  }
}
