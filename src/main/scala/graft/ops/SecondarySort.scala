package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Secondary-key sort: the reference's SecondaryKeyOptimizer pattern
  * [R: …/mapReduceLayer/SecondaryKeyOptimizer.java] — nested
  * ORDER/DISTINCT inside FOREACH becomes shuffle-sort on
  * (group key, inner key), so each group arrives as an ordered run and
  * is processed with an iterator, never materialized as a bag.
  *
  * Spark shape: `repartition(keys)` + `sortWithinPartitions(keys ++
  * inner)` + a partition-level run iterator. One shuffle, no
  * per-group collect_list — the bag-spill hazard (SURVEY.md §7.4 #1)
  * never arises, which is what makes this the 100 TB-safe form of
  * per-group sequential logic.
  */
object SecondarySort {

  /** Process each key's rows in inner-sort order with a streaming fold.
    *
    * @param keyCols   grouping key column names
    * @param sortCols  inner ordering columns (ascending)
    * @param schema    output schema of `f`
    * @param f         (key values, ordered row iterator) → output rows;
    *                  must consume the iterator lazily (it is shared)
    */
  def sortedGroups(df: DataFrame, keyCols: Seq[String], sortCols: Seq[String],
                   schema: StructType)
                  (f: (Seq[Any], Iterator[Row]) => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ sortCols).map(col): _*)
    val keyIdx = keyCols.map(df.columns.indexOf(_))
    val rdd = sorted.rdd.mapPartitions { it =>
      new Iterator[Iterator[Row]] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[Row] = {
          val key = keyIdx.map(buf.head.get)
          val run = new Iterator[Row] {
            def hasNext: Boolean =
              buf.hasNext && sameKey(keyIdx.map(buf.head.get), key)
            def next(): Row = buf.next()
          }
          val out = f(key, run)
          // drain any rows the callback didn't consume so the outer
          // iterator lands on the next key — LAZILY, after the
          // callback's output is exhausted (Iterator.++'s by-name
          // right operand; flatten consumes each inner iterator fully
          // before advancing). The old out.toVector materialized the
          // whole per-group output on one task — exactly the bag-spill
          // hazard this operator exists to avoid (r17 review).
          out ++ { while (run.hasNext) run.next(); Iterator.empty }
        }
      }.flatten
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Group-boundary equality that compares BinaryType key values by
    * CONTENT: Row.get returns a fresh Array[Byte] per access, and Seq
    * `==` on arrays is reference equality — a binary key column (e.g.
    * a fingerprint digest) would otherwise split every row into its
    * own group, silently (r17 review). Non-binary values (including
    * ArrayType, which Row.get surfaces as a value-equal Seq) keep
    * plain equality. */
  private def sameKey(a: Seq[Any], b: Seq[Any]): Boolean =
    a.length == b.length && a.indices.forall { i =>
      (a(i), b(i)) match {
        case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
        case (x, y) => x == y
      }
    }
}
