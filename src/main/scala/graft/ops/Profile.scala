package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass a pipeline runs before
  * training or migration: per-column non-null/null/distinct counts and
  * min/max, computed in ONE scan (every measure partial-aggregates;
  * the multiple exact `countDistinct`s expand to Catalyst's
  * multi-distinct plan, still one pass over the data) and unpivoted to
  * one row per column. Min/max are rendered to strings so
  * heterogeneous column types share one output schema — rendered from
  * the NATIVE type, so ordering semantics are the column's own.
  *
  * The unpivot is built programmatically (explode over an array of
  * structs) rather than a `stack()` selectExpr string, so column names
  * containing dots, spaces, hyphens, or backticks profile correctly,
  * and internal aliases are positional (`_graft_p<i>_*`) so no input
  * name can collide with them.
  *
  * At 100 TB: exact distinct counts shuffle by value — profile wide
  * tables with [[profileApprox]] / [[Sketches.approxDistinct]] instead
  * when 2% error is acceptable; this exact form is the oracle-checkable
  * one.
  */
object Profile {

  /** One aggregate row with positional aliases, then explode to one
    * row per profiled column. `ndAgg` supplies the distinct-count
    * aggregate (exact vs HLL++) and `ndName` its output column name.
    */
  private def profileWith(df: DataFrame, cols: Seq[String],
                          ndAgg: Column => Column, ndName: String): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // backtick-quote input refs: an unquoted `col("user.id")` splits on
    // the dot and resolves as a struct-field access
    def in(c: String): Column = col(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(in(c)).as(s"_graft_p${i}_n"),
        // count, not sum: sum over an empty table is NULL, and a
        // quality gate reading n_null == 0 would misclassify it
        count(when(in(c).isNull, lit(1))).as(s"_graft_p${i}_nn"),
        ndAgg(in(c)).as(s"_graft_p${i}_nd"),
        min(in(c)).cast("string").as(s"_graft_p${i}_mn"),
        max(in(c)).cast("string").as(s"_graft_p${i}_mx"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"_graft_p${i}_n").as("n_nonnull"),
        col(s"_graft_p${i}_nn").as("n_null"),
        col(s"_graft_p${i}_nd").as(ndName),
        col(s"_graft_p${i}_mn").as("min_str"),
        col(s"_graft_p${i}_mx").as("max_str"))
    }
    row.select(explode(array(entries: _*)).as("_graft_prof")).select(col("_graft_prof.*"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, countDistinct(_), "n_distinct")

  /** The 100 TB form of [[profile]]: `approx_count_distinct` (HLL++,
    * fixed-size sketch, partial/final) instead of exact distinct, so
    * the whole profile is ONE map-side-combinable pass with no
    * multi-distinct Expand (the exact form triples rows per distinct
    * column before its shuffle). `rsd` is the usual HLL++ relative
    * standard deviation knob (default 2%; ProfileSpec bounds the
    * observed error at 3·rsd).
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, approx_count_distinct(_, rsd), "approx_distinct")
}
