package org.apache.spark

/** Bridge for draining the SparkListener bus (`listenerBus` is
  * private[spark]). Bench attributes task metrics to the query that just
  * ran; listener events post asynchronously, so without a drain a heavy
  * query's tail metrics would be charged to the NEXT query. Lives in the
  * org.apache.spark package solely for access — the [[sql.GraftExpr]]
  * pattern.
  */
object GraftListeners {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
