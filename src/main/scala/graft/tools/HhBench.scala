package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Graft, Tables}

/** A/B microbench for the r15 HeavyHittersAgg buffer rework (VERDICT
  * r14 task 4): times the AGGREGATION STAGE alone — sketch over the
  * sf0.1 word stream — for the current mutable-HashMap buffer vs the
  * r14 immutable-Map-rebuilt-per-row form (kept below verbatim as the
  * baseline). The q111 driver query buries the agg under its property
  * oracle's exact-count jobs, so the full-query number can't see this
  * change; this isolates it.
  */
object HhBench {

  /** The r14 implementation, frozen for comparison. */
  private class OldAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= capacity) m
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        m.flatMap { case (k, c) => if (c - cut > 0) Some(k -> (c - cut)) else None }
      }
    override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
      if (key == null) buf
      else trim(buf.updated(key, buf.getOrElse(key, 0L) + 1L))
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      trim(b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      })
    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (k, c) => (-c, k) }
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.localSession(cpus, "hh-bench")
    spark.sparkContext.setLogLevel("WARN")
    // factor multiplies each word in place (array_repeat explode): same
    // key distribution, f× the rows per task, so per-row buffer cost
    // dominates scheduling at larger f
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val words = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(array_repeat(col("w"), factor)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = words.count()
    val cap = 64
    val newF = udaf(new graft.ops.HeavyHittersAgg(cap))
    val oldF = udaf(new OldAgg(cap))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(c: org.apache.spark.sql.Column): Unit =
      words.agg(c.as("hh")).selectExpr("size(hh)").head()
    // warm both codepaths, then alternate 5 timed iterations each
    run(newF(col("k"))); run(oldF(col("k")))
    val newT = mutable.ArrayBuffer.empty[Double]
    val oldT = mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) {
      oldT += time(run(oldF(col("k"))))
      newT += time(run(newF(col("k"))))
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.length / 2)
    println(f"HHBENCH n_words=$n old_median=${med(oldT.toSeq)}%.3f " +
      f"new_median=${med(newT.toSeq)}%.3f " +
      f"old=[${oldT.map(t => f"$t%.3f").mkString(",")}] " +
      f"new=[${newT.map(t => f"$t%.3f").mkString(",")}]")
    spark.stop()
  }
}
