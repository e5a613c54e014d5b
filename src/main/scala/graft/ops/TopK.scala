package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation (SURVEY.md §4.3's "fused top-k" candidate):
  * keeps the k best (score desc, id asc) pairs in the aggregation
  * buffer. Because it's an Aggregator, Spark runs it partial/final —
  * each map task keeps only k rows, so a top-k over N scored pairs
  * shuffles O(k × partitions) instead of sorting N rows through a
  * window. That's the difference between "works" and "works at 100 TB"
  * for similarity search.
  *
  * Determinism: total order on (score desc, id asc) — same tie rule as
  * the window-function formulation, so both produce identical rows.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    // buf is sorted: score desc, id asc; bounded at k
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

object TopKAgg {

  /** Column form: topK(5)(col("score"), col("id")) → array<struct<_1,_2>>. */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg(k))
    (score, id) => f(score, id)
  }
}
