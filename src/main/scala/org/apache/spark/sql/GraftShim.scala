package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported way to ship a custom Catalyst `Expression` as a library
  * `Column` function without per-session function registration (which
  * would break in sessions the library doesn't construct).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Block until the listener bus has delivered every queued event —
    * lets a caller counting stages via SparkListener read an EXACT
    * count right after an action, instead of sleeping and hoping
    * (listener events are posted asynchronously). */
  def waitListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** True when the session's CacheManager holds at least one cached
    * (persisted) plan — lets Bench detect SQL-cache-populating queries
    * the same way it detects trained-index caches (`sharedState` is
    * private[sql], hence the shim). */
  def sqlCacheNonEmpty(spark: SparkSession): Boolean =
    !spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Register a SQL function on an ALREADY-BUILT session — extensions
    * (the preferred path) only apply at session build time, but a library
    * can't always own session construction. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
