package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters —
  * the supported technique for libraries that define native Catalyst
  * expressions (the public API intentionally hides Expression behind
  * ColumnNode in Spark 4). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` plan→DataFrame constructor — needed
  * by relations assembled directly from execution-layer parts (e.g.
  * [[graft.sources.ZoneMap.table]]'s HadoopFsRelation over a custom
  * FileIndex, the extension point Spark itself uses for file-skipping
  * table formats). */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Bridge to `private[sql]` session internals: the per-session UUID is
  * the correct identity key for session-scoped caches (stable, never
  * reused — unlike System.identityHashCode, which can collide after
  * GC). */
object SessionBridge {
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
