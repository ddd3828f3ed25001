package graft

import org.scalatest.funsuite.AnyFunSuite

/** r14: the q215 cascade's tier pins are mode-parametric — localCheckpoint
  * blocks (fast default) vs durable parquet spill (GRAFT_DEDUP_RELIABLE=1,
  * the executor-loss-tolerant deployment mode, mirroring GRAFT_CC_RELIABLE).
  * The pin mode is pure materialization plumbing, so the two modes must be
  * row-identical; this spec pins it so neither path can drift.
  */
class DedupCascadeModesSpec extends AnyFunSuite {
  import TestSpark._

  test("q215 cascade: durable parquet-spill mode matches block mode") {
    def run(reliable: Option[String]): Seq[(String, Long)] =
      graft.queries.DedupQueries.dedupCascade(spark, sf0001, reliable)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val block = run(None)
    val tmp = java.nio.file.Files.createTempDirectory("q215-reliable").toString
    val durable = run(Some(tmp))
    assert(block.nonEmpty && block == durable,
      s"block=$block durable=$durable")
    // the durable trail exists — what a lost executor's retry re-reads
    assert(new java.io.File(s"$tmp/tier_1").exists(),
      "reliable mode left no durable tier artifacts")
  }
}
