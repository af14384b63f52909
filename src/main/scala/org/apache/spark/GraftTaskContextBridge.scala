package org.apache.spark

/** Bridge to the package-private `TaskContext.setTaskContext`, needed
  * by graft's pipe operator: its stdin-feeder thread consumes the
  * partition iterator — which on a cluster can be a shuffle-reading
  * iterator that requires an attached TaskContext (fetch-failure
  * bookkeeping, kill/interrupt checks). Spark's own PipedRDD sets the
  * context on its writer thread the same way
  * (core/src/main/scala/org/apache/spark/rdd/PipedRDD.scala).
  */
object GraftTaskContextBridge {
  def attach(tc: TaskContext): Unit =
    if (tc != null) TaskContext.setTaskContext(tc)
}
