package org.apache.spark.graftsync

import org.apache.spark.SparkContext

/** Test-only bridge to the `private[spark]` listener bus: a spec that
  * asserts "this produced ZERO jobs" needs a deterministic flush of
  * the async listener queue before reading its counter — the public
  * API offers none. */
object ListenerSync {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
