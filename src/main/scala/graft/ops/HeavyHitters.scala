package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a mergeable Aggregator — the
  * 100 TB form of "top words / hot keys" (the exact form is
  * [[graft.llm.Text.vocabulary]]'s full word-count aggregation, whose
  * shuffle carries EVERY distinct key): the buffer holds at most
  * `capacity` counters, so each map task ships a bounded sketch
  * regardless of key cardinality, and Spark runs it partial/final like
  * any algebraic aggregate.
  *
  * Guarantees (the classic MG bound, property-tested in
  * HeavyHittersSpec and the q111 oracle): for every reported item,
  * `true_freq − capacity·err ≤ est ≤ true_freq` where the total
  * decrement `err ≤ N/(capacity+1)`; therefore every item with
  * `true_freq > N/(capacity+1)` IS reported. Merging sums counters
  * then trims back to `capacity` by subtracting the (capacity+1)-th
  * largest count (Agarwal et al., "Mergeable Summaries", PODS'12 —
  * the merge preserves the same error bound, which is what makes the
  * sketch partial/final-safe).
  *
  * Determinism: counters are exact integers; trim subtraction and
  * final ordering use (count desc, key asc) total order, so the
  * result is independent of partition order UP TO the documented
  * estimate error (estimates themselves may vary with partitioning —
  * only the guarantees are invariant, which is exactly what the
  * property oracle states).
  */
class HeavyHittersAgg(capacity: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, "heavy-hitters capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      // subtract the (capacity+1)-th largest count from everyone and
      // drop non-positive counters — the standard MG decrement batch
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      m.flatMap { case (k, c) => if (c - cut > 0) Some(k -> (c - cut)) else None }
    }

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    // null inputs are ignored, like count/countDistinct — udaf-wrapped
    // Aggregators receive them un-filtered, and a null key would both
    // surface as a bogus heavy hitter and NPE finish()'s tie-order
    // String comparison
    if (key == null) buf
    else trim(buf.updated(key, buf.getOrElse(key, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    trim(summed)
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {

  /** Column form: heavyHitters(k)(col("word")) →
    * array<struct<_1: string, _2: long>> sorted (count desc, key asc).
    */
  def heavyHitters(capacity: Int): Column => Column = {
    val f = udaf(new HeavyHittersAgg(capacity))
    key => f(key)
  }
}
