package org.apache.spark

/** `private[spark]` bridge for graft.Meter: the listener bus posts
  * stage events asynchronously, so metric tallies must drain the bus
  * before reading — the API for that is package-private.
  */
object GraftListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
