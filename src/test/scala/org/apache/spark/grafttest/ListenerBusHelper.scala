package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only bridge to the `private[spark]` listener bus: lets specs
  * counting SQL-execution events drain the asynchronous bus
  * deterministically instead of sleeping a fixed interval (which is
  * exactly the flake on a loaded host — events still in flight when
  * the assertion reads the counter). */
object ListenerBusHelper {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
