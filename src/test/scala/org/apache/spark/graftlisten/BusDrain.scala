package org.apache.spark.graftlisten

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus: lets a spec
  * wait until all queued task-end events reached its listeners before it
  * reads the collected metrics (actions return before the bus drains). */
object BusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
