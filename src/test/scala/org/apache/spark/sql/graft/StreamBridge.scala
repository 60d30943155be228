package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Test-only bridge into `private[sql]` streaming internals: the last
  * microbatch's executed physical plan, for plan-shape assertions on
  * streaming queries (the streaming analog of `df.queryExecution`). */
object StreamBridge {
  def lastExecutedPlan(q: StreamingQuery): String =
    q.asInstanceOf[StreamingQueryWrapper].streamingQuery
      .lastExecution.executedPlan.toString
}
