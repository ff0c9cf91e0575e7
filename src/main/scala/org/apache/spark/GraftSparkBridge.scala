package org.apache.spark

/** Minimal bridge to `private[spark]` scheduler internals (same auditable
  * single-object pattern as org.apache.spark.sql.GraftSqlBridge). The
  * incremental Runner's step-width feedback reads a SparkListener-fed task
  * CPU accumulator, and listener events are delivered asynchronously on the
  * bus — snapshotting without draining under-counts a step's CPU and can
  * derive a too-narrow shuffle width for the next step (the q151-class
  * regression the measurement exists to prevent). */
object GraftSparkBridge {
  /** Wait (bounded) until the listener bus has delivered every queued
    * event. A timeout is swallowed: the caller's metric then simply misses
    * the still-queued tail, which its own retention logic must treat
    * conservatively. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
