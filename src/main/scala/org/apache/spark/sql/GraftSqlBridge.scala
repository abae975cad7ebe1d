package org.apache.spark.sql

import org.apache.spark.sql.internal.SortOrder

/**
 * Minimal `private[sql]` bridge for graft's DistScan: a sort Column built
 * with `.asc`/`.desc` wraps its value in a `SortOrder` ColumnNode, and the
 * node API is `private[sql]` — this is the one sanctioned way (the
 * ecosystem-standard `org.apache.spark.sql` shim file) to read the sort
 * direction back without reflection. No Spark internals are re-exported:
 * the only surface is `sortInfo`.
 */
object GraftSqlBridge { // internal to graft; not user API

  /** (value column without the sort wrapper, isDescending). A Column that
   * is not a sort order is its own value, ascending (Spark's default
   * orderBy direction). Null ordering is not surfaced: DistScan documents
   * Spark's defaults (nulls first when ascending, last when descending). */
  def sortInfo(c: Column): (Column, Boolean) = c.node match {
    case SortOrder(child, direction, _, _) =>
      (new Column(child), direction == SortOrder.Descending)
    case _ => (c, false)
  }
}
