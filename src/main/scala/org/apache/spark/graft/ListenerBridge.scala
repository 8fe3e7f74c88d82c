package org.apache.spark.graft

import org.apache.spark.SparkContext

/**
 * Deterministic listener-bus drain for probe assertions that read
 * listener-accumulated metrics (task result sizes). `listenerBus` is
 * `private[spark]`, hence this one-method bridge — the same pattern as
 * [[org.apache.spark.sql.graft.ColumnBridge]]. Replaces fixed
 * `Thread.sleep` drains, which both inflated probe timings and raced
 * slow buses.
 */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
