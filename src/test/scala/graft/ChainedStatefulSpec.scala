package graft

import org.scalatest.funsuite.AnyFunSuite

/** q165 pin: the streaming query must contain BOTH stateful operators —
  * dedup state AND aggregation state — chained in one micro-batch plan
  * (Spark 4 multi-stateful support), not a collapsed single-state plan.
  */
class ChainedStatefulSpec extends AnyFunSuite {
  import TestSpark._

  test("q165 chains dedup state into aggregation state in one query") {
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      @volatile var statefulOps: Seq[String] = Nil
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators.map(_.operatorName).toSeq
        if (ops.nonEmpty) statefulOps = ops
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val df = SparkEntry.queries("q165_stream_dedup_agg")(spark, sf0001)
      assert(df.count() > 0)
      // two distinct stateful operators reported by the engine
      assert(listener.statefulOps.exists(_.toLowerCase.contains("dedup")),
        s"no dedup state operator in ${listener.statefulOps}")
      // the streaming aggregation's state operator is named stateStoreSave
      assert(listener.statefulOps.exists(_.toLowerCase.contains("statestoresave")),
        s"no aggregation state operator in ${listener.statefulOps}")
      assert(listener.statefulOps.size == 2, listener.statefulOps.toString)
    } finally spark.streams.removeListener(listener)
  }
}
