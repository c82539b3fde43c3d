package org.apache.spark

/** Bridge to the private[spark] listener bus drain, used by diagnostic
  * tools (graft.tools.Repeats) that read QueryExecutionListener-captured
  * plan facts immediately after a synchronous action: listener events are
  * posted asynchronously, so without a drain the repeat that just finished
  * could be attributed the NEXT repeat's plans.
  */
object GraftListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
