package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic flush of the asynchronous listener bus: the per-query
  * job/stage/task counters in [[graft.Bench]] would otherwise race the
  * tail of the query they just measured. `listenerBus` is
  * `private[spark]`, hence this one-call shim lives in the
  * `org.apache.spark` namespace (public Spark distribution only — same
  * altitude as the codegen expression shim in `org.apache.spark.sql.graft`).
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
