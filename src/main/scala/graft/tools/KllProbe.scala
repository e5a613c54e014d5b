package graft.tools

import org.apache.spark.sql.functions._
import graft.{Graft, Tables}
import graft.ops.QuantileSketch

/** Stage decomposition for q120_quantile_sketch's 6.3 s (VERDICT r16
  * task 3): the query runs (a) a corpus count, (b) the per-group udaf
  * SKETCH BUILD over l_extendedprice, (c) the raw-data-free RE-MERGE
  * to a global sketch, (d) the pure-column-math quantile ESTIMATES,
  * and (e) the ×5 VERIFICATION re-scan (5-row broadcast crossJoin +
  * corpus groupBy) — so "where do the 6.3 s go" has a measured answer
  * (udaf insert path vs oracle work), not a guess. An optional factor
  * arg repeats the corpus in place to probe the insert path at volume.
  */
object KllProbe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.localSession(cpus, "kll-probe")
    spark.sparkContext.setLogLevel("WARN")
    val li0 = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val li = (if (factor == 1) li0
      else li0.select(col("l_returnflag"),
        explode(array_repeat(col("l_extendedprice"), factor))
          .as("l_extendedprice")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (iter <- 1 to 2) {
      val (tCount, n) = time(li.count())
      val (tBuild, perGroup) = time {
        val pg = QuantileSketch.sketchBy(li, Seq("l_returnflag"),
            col("l_extendedprice"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pg.count()
        pg
      }
      val (tMerge, global) = time {
        val g = QuantileSketch.mergeSketches(perGroup, Seq.empty)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        g.count()
        g
      }
      val phis = Seq(0.01, 0.25, 0.50, 0.75, 0.99)
      val (tEst, est) = time {
        val e = global.select(
          QuantileSketch.totalWeight(col("kll")).as("tw"),
          explode(array(phis.map(p => struct(
            lit(p).as("phi"),
            QuantileSketch.quantile(col("kll"), p).as("est"))): _*)).as("q"))
          .select(col("q.phi").as("phi"), col("q.est").as("est"), col("tw"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count()
        e
      }
      val (tVerify, _) = time {
        li.select(col("l_extendedprice").as("v"))
          .crossJoin(broadcast(est))
          .groupBy(col("phi"), col("est"), col("tw"))
          .agg(
            sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rank_le"),
            sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("rank_lt"))
          .count()
      }
      // est decomposition: one phi (one quantile tree) vs all five;
      // sort-once-then-fold-per-phi variant
      val (tEst1, _) = time {
        global.select(QuantileSketch.quantile(col("kll"), 0.5).as("est"))
          .count()
      }
      // the production shared form itself (r17 review: probe the real
      // helpers, not an inline replica that could drift)
      val (tEstShared, _) = time {
        global.select(
            QuantileSketch.totalWeight(col("kll")).as("tw"),
            QuantileSketch.weightedItems(col("kll")).as("items"))
          .select(col("tw"), col("items"),
            explode(array(phis.map(lit): _*)).as("phi"))
          .select(col("phi"),
            QuantileSketch.quantileAt(col("items"), col("tw"), col("phi"))
              .as("est"),
            col("tw"))
          .count()
      }
      est.unpersist(); global.unpersist(); perGroup.unpersist()
      println(f"KLLPROBE iter=$iter factor=$factor n=$n " +
        f"count=${tCount}%.2f build=${tBuild}%.2f merge=${tMerge}%.2f " +
        f"est=${tEst}%.2f est1=${tEst1}%.2f estShared=${tEstShared}%.2f " +
        f"verify=${tVerify}%.2f")
    }
    spark.stop()
  }
}
