package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Graft, Tables}

/** A/B microbench for the r17 TopKAgg buffer rework (VERDICT r16 task
  * 5): times the AGGREGATION STAGE alone — bounded top-k over a scored
  * sf0.1 word stream — for the mutable primitive-array buffer vs the
  * r16 immutable-Seq-`sortWith`-per-improving-insert form (kept below
  * verbatim as the baseline). The TopKAgg consumers (q34/q39/q92/q93/
  * q121/q123) bury the agg under scoring/verification work, so full-
  * query numbers can't see this change; this isolates it, the HhBench
  * pattern.
  */
object TkBench {

  /** The r16 implementation, frozen for comparison. */
  private class OldAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
      if (buf.size >= k && better(buf.last, x)) buf
      else ((buf :+ x).sortWith(better) : Seq[(Double, Long)]).take(k)
    }
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
      insert(buf, in)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      ((a ++ b).sortWith(better) : Seq[(Double, Long)]).take(k)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.localSession(cpus, "tk-bench")
    spark.sparkContext.setLogLevel("WARN")
    // factor multiplies the scored stream in place; scores derive from
    // a per-copy hash so improving inserts keep arriving throughout
    // (a monotone stream would hit only the cheap reject path)
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val scored = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(posexplode(array_repeat(col("w"), factor)))
      .select(
        (xxhash64(col("col"), col("pos")).cast("double") / lit(1e18)).as("s"),
        xxhash64(col("col"), col("pos"), lit(7)).as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = scored.count()
    val newF = udaf(new graft.ops.TopKAgg(k))
    val oldF = udaf(new OldAgg(k))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Seq[Any] =
      scored.agg(f(col("s"), col("id")).as("tk"))
        .selectExpr("size(tk)", "tk[0]._1", "tk[0]._2")
        .head().toSeq
    // identical results first (bit-identity check rides the warmup)
    val a = run((s, id) => newF(s, id))
    val b = run((s, id) => oldF(s, id))
    require(a == b, s"old/new top-1 diverged: $a vs $b")
    val newT = mutable.ArrayBuffer.empty[Double]
    val oldT = mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) {
      oldT += time(run((s, id) => oldF(s, id)))
      newT += time(run((s, id) => newF(s, id)))
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.length / 2)
    println(f"TKBENCH n_rows=$n k=$k old_median=${med(oldT.toSeq)}%.3f " +
      f"new_median=${med(newT.toSeq)}%.3f " +
      f"old=[${oldT.map(t => f"$t%.3f").mkString(",")}] " +
      f"new=[${newT.map(t => f"$t%.3f").mkString(",")}]")
    spark.stop()
  }
}
