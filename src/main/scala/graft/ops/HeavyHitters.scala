package graft.ops

import scala.collection.mutable

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
  * `true_freq − err ≤ est ≤ true_freq` where the total decrement
  * `err ≤ N/(capacity+1)` (each of the ≤ err decrement rounds touches
  * any given key at most once); therefore every item with
  * `true_freq > N/(capacity+1)` IS reported. Merging sums counters
  * then trims back to `capacity` by subtracting the (capacity+1)-th
  * largest count (Agarwal et al., "Mergeable Summaries", PODS'12 —
  * the merge preserves the same error bound, which is what makes the
  * sketch partial/final-safe).
  *
  * The buffer is a mutable HashMap mutated in place (udaf wraps the
  * Aggregator in a TypedImperativeAggregate, so the buffer lives as a
  * JVM object between rows and serializes only at shuffle/spill
  * boundaries — the MedianAgg lesson): per-row cost is one hash probe,
  * not an immutable-Map rebuild. The reduce-path trim needs no sort at
  * all — overflow size is exactly capacity+1, so the (capacity+1)-th
  * largest count IS the minimum, an O(capacity) scan; only the rare
  * merge path (≤2·capacity entries, once per partial buffer pair)
  * selects the cut from a sorted copy.
  *
  * Determinism: counters are exact integers; trim subtraction and
  * final ordering use (count desc, key asc) total order, so the
  * result is independent of partition order UP TO the documented
  * estimate error (estimates themselves may vary with partitioning —
  * only the guarantees are invariant, which is exactly what the
  * property oracle states).
  */
class HeavyHittersAgg(capacity: Int)
  extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, "heavy-hitters capacity must be positive")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Subtract `cut` from every counter in place and drop non-positive
    * ones — the standard MG decrement batch. */
  private def decrement(m: mutable.HashMap[String, Long], cut: Long): Unit = {
    m.filterInPlace((_, c) => c - cut > 0)
    m.mapValuesInPlace((_, c) => c - cut)
  }

  override def reduce(buf: mutable.HashMap[String, Long], key: String): mutable.HashMap[String, Long] = {
    // null inputs are ignored, like count/countDistinct — udaf-wrapped
    // Aggregators receive them un-filtered, and a null key would both
    // surface as a bogus heavy hitter and NPE finish()'s tie-order
    // String comparison
    if (key != null) {
      buf.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
      if (buf.size > capacity) {
        // the trim only fires right after a NEW key entered at count 1,
        // and every survivor of a previous decrement is >= 1 — so the
        // minimum is provably the constant 1; no O(capacity) scan
        // (r17 review: the scan always rediscovered 1)
        decrement(buf, 1L)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) =>
      a.updateWith(k) { prev => Some(prev.getOrElse(0L) + c) }
    }
    if (a.size > capacity) {
      // ≤ 2·capacity entries, once per buffer pair: select the
      // (capacity+1)-th largest count as the decrement batch
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      decrement(a, counts(counts.length - 1 - capacity))
    }
    a
  }

  override def finish(m: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[mutable.HashMap[String, Long]]()
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
