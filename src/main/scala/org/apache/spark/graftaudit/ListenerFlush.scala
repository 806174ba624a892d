package org.apache.spark.graftaudit

import org.apache.spark.SparkContext

/** `graft.ExplainAudit`'s one Spark-internal touch: QueryExecution
  * listener callbacks ride the async LiveListenerBus, so an audit
  * that captures the plans executed DURING a gate's construction
  * must drain the bus before reading its capture buffer — otherwise
  * the last eager stage's plan races the read. `listenerBus` is
  * `private[spark]`, hence this shim package (the standard pattern
  * for test/tooling access; nothing here runs on a query path).
  */
object ListenerFlush {
  def flush(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
