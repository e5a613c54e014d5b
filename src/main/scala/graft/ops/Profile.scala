package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass a pipeline runs before
  * training or migration: per-column non-null/null/distinct counts and
  * min/max, computed in ONE scan (every measure partial-aggregates;
  * the multiple exact `countDistinct`s expand to Catalyst's
  * multi-distinct plan, still one pass over the data) and unpivoted to
  * one row per column with `stack`. Min/max are rendered to strings so
  * heterogeneous column types share one output schema — rendered from
  * the NATIVE type, so ordering semantics are the column's own.
  *
  * At 100 TB: exact distinct counts shuffle by value — profile wide
  * tables with [[Sketches.approxDistinct]] instead when 2% error is
  * acceptable; this exact form is the oracle-checkable one.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr =
      s"stack(${cols.size}, " + cols.map(c =>
        s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx").mkString(", ") +
        ") as (col_name, n_nonnull, n_null, n_distinct, min_str, max_str)"
    row.selectExpr(stackExpr)
  }

  /** The 100 TB form of [[profile]]: `approx_count_distinct` (HLL++,
    * fixed-size sketch, partial/final) instead of exact distinct, so
    * the whole profile is ONE map-side-combinable pass with no
    * multi-distinct Expand (the exact form triples rows per distinct
    * column before its shuffle). `rsd` is the usual HLL++ relative
    * standard deviation knob (default 2%; ProfileSpec bounds the
    * observed error at 3·rsd).
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr =
      s"stack(${cols.size}, " + cols.map(c =>
        s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx").mkString(", ") +
        ") as (col_name, n_nonnull, n_null, approx_distinct, min_str, max_str)"
    row.selectExpr(stackExpr)
  }
}
