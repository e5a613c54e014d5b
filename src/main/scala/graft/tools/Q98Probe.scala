package graft.tools

import org.apache.spark.sql.functions._
import graft.{Graft, Tables}
import graft.llm.{Dedup, Similarity}

/** Stage decomposition for q98_semdedup's 256× superlinear step (r15
  * task 6): times, at a given harness factor, (a) k-means TRAINING
  * (sample collect + driver Lloyd at k = 16·m), (b) corpus cell
  * ASSIGNMENT (`graft_nearest_cells`, O(rows·nCells) by construction),
  * (c) the within-cell pair generation + cosine filter, and (d) the
  * full operator — so the superlinear term has a name, not a guess.
  */
object Q98Probe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.localSession(cpus, "q98-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val emb = (1 until m).map { c =>
      base.select((col("vec_id") + c.toLong * 10000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(pmod(xxhash64(lit(c), i), lit(2)) === 0, x).otherwise(-x))
          .as("embedding"))
    }.foldLeft(base)(_ union _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val nCells = 16 * m
    for (iter <- 1 to 2) {
      val (tTrain, cents) = time(
        Similarity.kmeansCentroids(emb, "vec_id", "embedding", nCells, iters = 3))
      val assigned = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
          Similarity.nearestCellsExpr(cents, 1)(col("embedding"))(0).as("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tAssign, _) = time(assigned.count())
      val ids = assigned.select(col("cell"), col("id"))
      val (tPairs, nPairs) = time(
        ids.toDF("cell", "id_a").join(ids.toDF("cell", "id_b"), "cell")
          .filter(col("id_a") < col("id_b"))
          .join(assigned.select(col("id").as("id_a"), col("v").as("va")), "id_a")
          .join(assigned.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
          .filter(Similarity.cosineExpr(col("va"), col("vb")) >= 0.4)
          .count())
      assigned.unpersist(blocking = true)
      val (tFull, removed) = time(
        Dedup.semDedup(emb, "vec_id", "embedding",
          nCells = nCells, threshold = 0.4, smallGraph = 0L)
          .filter(!col("is_keeper")).count())
      println(f"Q98PROBE iter=$iter m=$m n=$n nCells=$nCells " +
        f"train=${tTrain}%.1f assign=${tAssign}%.1f pairs=${tPairs}%.1f " +
        f"(n_pairs=$nPairs) full=${tFull}%.1f removed=$removed")
    }
    spark.stop()
  }
}
