package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into the private[spark] listener bus — lets specs
  * drain listener events deterministically instead of sleeping.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
