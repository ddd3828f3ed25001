package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeansTrainer

/** Pins the trained-quantizer laws behind q282/q283/q284:
  *  - the SCAN LAW: R Lloyd rounds cost exactly R corpus aggregates (and
  *    trainPq trains all m subspace codebooks inside those same R — m
  *    trainings never cost m·R scans);
  *  - PARTITIONING INVARIANCE: the exact-decimal mean update makes the
  *    learned model independent of the input's physical layout (a double
  *    sum would be order-dependent — the property that makes a trained
  *    model gateable at all);
  *  - EMPTY-CLUSTER CARRY: a cluster that attracts no members keeps its
  *    previous centroid, deterministically (the SQL-replayable choice).
  */
class KMeansTrainerSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus(n: Int, parts: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.1))
    }.toDF("vec_id", "e").repartition(parts)
  }

  test("scan law: R rounds = R corpus aggregates; trainPq shares them across subspaces") {
    val e = corpus(60, 4)
    val (_, scans) = KMeansTrainer.train(e, k = 3, rounds = 4)
    assert(scans == 4, s"4 rounds must cost exactly 4 corpus aggregates, got $scans")
    val (cbs, pqScans) = KMeansTrainer.trainPq(e, m = 4, dsub = 2, ksub = 2, rounds = 3)
    assert(pqScans == 3,
      s"4 subspace codebooks over 3 rounds must cost 3 aggregates (not 12), got $pqScans")
    assert(cbs.length == 4 && cbs.forall(_.length == 2)
      && cbs.forall(_.forall(_.length == 2)))
  }

  test("the learned model is invariant under input partitioning (exact-decimal means)") {
    val a = KMeansTrainer.train(corpus(80, 2), k = 4, rounds = 3)._1
    val b = KMeansTrainer.train(corpus(80, 13), k = 4, rounds = 3)._1
    assert(a.length == b.length)
    a.zip(b).foreach { case (ca, cb) =>
      assert(ca.sameElements(cb),
        "centroids differ across partitionings — the mean update is order-dependent")
    }
    val pa = KMeansTrainer.trainPq(corpus(80, 2), 4, 2, 2, 2)._1
    val pb = KMeansTrainer.trainPq(corpus(80, 13), 4, 2, 2, 2)._1
    pa.zip(pb).foreach { case (ja, jb) =>
      ja.zip(jb).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
  }

  test("an empty cluster keeps its previous centroid") {
    // all points sit in the +x half-space; a centroid at -x loses the
    // cosine argmax everywhere and must carry through unchanged
    val e = corpus(20, 3)
    val plus = Array.tabulate(8)(d => if (d == 0) 1.0 else 0.1)
    val minus = Array.tabulate(8)(d => if (d == 0) -1.0 else -0.1)
    val next = KMeansTrainer.lloydRound(e, Array(plus, minus))
    assert(next(1).sameElements(minus),
      "empty cluster's centroid must be carried, not zeroed or dropped")
    assert(!next(0).sameElements(plus), "the populated cluster must move")
  }

  test("seeds are the md5-ordered prefix (derandomized, engine-replayable)") {
    val e = corpus(30, 4)
    val want = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(2).select("e").collect().map(_.getSeq[Double](0).toArray)
    val got = KMeansTrainer.seeds(e, 2)
    want.zip(got).foreach { case (w, g) => assert(w.sameElements(g)) }
  }
}
