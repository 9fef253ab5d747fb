package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus: task-end events are
  * delivered asynchronously, so a benchmark reading per-query metric
  * deltas must drain the queue between queries or attribute a query's
  * tail events to the next one. Lives under `org.apache.spark` solely
  * to reach `listenerBus.waitUntilEmpty()` — no Spark internals are
  * modified.
  */
object BusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
