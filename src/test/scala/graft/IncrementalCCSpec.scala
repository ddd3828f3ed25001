package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IncrementalCC, VersionedView}

/** Pins the streaming union-find (q250's sink): batch-split invariance
  * against one-shot batch CC, cross-batch component MERGES (the case a
  * naive per-batch CC gets wrong), and replay idempotency.
  */
class IncrementalCCSpec extends AnyFunSuite {
  import TestSpark._

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("u", "v")
  }

  private def state(out: String) =
    VersionedView.read(spark, out).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cross-batch merges resolve to the min-id rep, any batch split") {
    val out = tmpDir("icc-merge")
    val sink = IncrementalCC.ccSink(out)
    // batch 0: two separate components {1,2} and {5,6}
    sink(edges((2L, 1L), (5L, 6L)), 0L)
    assert(state(out) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
    // batch 1: a bridge 2-6 merges them; every member must relabel to 1
    sink(edges((2L, 6L)), 1L)
    assert(state(out) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L))
    // batch 2: a NEW smaller node joins and becomes the rep of everything
    sink(edges((6L, 0L)), 2L)
    assert(state(out) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("incremental fixpoint equals one-shot batch CC; replay is a no-op") {
    val all = Seq((1L, 2L), (2L, 3L), (7L, 8L), (3L, 7L), (10L, 11L), (4L, 4L))
    val oneShot = graft.operators.ConnectedComponents(
      edges(all.filterNot(e => e._1 == e._2): _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = tmpDir("icc-split")
    val sink = IncrementalCC.ccSink(out)
    sink(edges(all(0), all(5)), 0L) // self-loop rides along, must be ignored
    sink(edges(all(1), all(4)), 1L)
    sink(edges(all(2)), 2L)
    sink(edges(all(3)), 3L)
    assert(state(out) == oneShot)
    sink(edges(all(3)), 3L) // replay of a published batch
    assert(state(out) == oneShot)
  }
}
