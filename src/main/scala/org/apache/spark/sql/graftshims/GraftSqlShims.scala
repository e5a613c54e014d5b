package org.apache.spark.sql.graftshims

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{SortOrder => SortOrderNode}

/** Minimal bridge into `private[sql]` Column internals (Spark 4 moved
  * `Column.expr` behind the classic module and represents `.asc`/`.desc`
  * as an internal SortOrder ColumnNode). Used only where an API
  * legitimately accepts sort-order Columns and needs the underlying key
  * expression back — e.g. [[graft.ops.Rank.prefixSum]]'s debug
  * uniqueness check, which must SELECT the sort keys.
  */
object GraftSqlShims {

  /** The key expression of a Column, with any SortOrder wrapper
    * (`.asc`/`.desc`) stripped so the result is selectable.
    */
  def sortKey(c: Column): Column = c.node match {
    case so: SortOrderNode => Column(so.child)
    case _ => c
  }
}
