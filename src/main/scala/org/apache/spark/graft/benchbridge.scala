package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Benchmark-instrumentation shim: `SparkContext.listenerBus` is
  * `private[spark]`, so draining it (required for exact per-run task-metric
  * deltas — listener events post asynchronously) needs a file under the
  * org.apache.spark namespace. Same seam pattern as the sql bridge. */
object benchbridge {
  /** Block until every queued listener event has been delivered. */
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
