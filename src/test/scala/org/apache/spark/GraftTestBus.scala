package org.apache.spark

/** Test-only bridge to the private[spark] listener bus, so specs can flush
  * pending listener events before asserting on job counters.
  */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
