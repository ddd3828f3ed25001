package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Udafs

/** Laws for the Misra-Gries heavy-hitter sketch (Udafs.MisraGries, q162)
  * and the degree-oriented triangle count (q164).
  */
class HeavyHitterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("MG superset guarantee holds under randomized skew and partitioning") {
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 3) {
      // zipf-ish: item i has frequency ~ n/i over a 200-item universe
      val items = (1 to 200).flatMap(i =>
        Seq.fill(2000 / i)(s"item_$i")) ++ Seq.fill(500)(s"noise_${rnd.nextInt(5000)}")
      val shuffled = rnd.shuffle(items)
      val k = 20
      val n = shuffled.size.toLong
      val exactHot = shuffled.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => k * c > n }.keySet.toSet
      val df = shuffled.toDF("t").repartition(3 + rnd.nextInt(10))
      val mg = udaf(new Udafs.MisraGries(k))
      val buf = df.agg(mg(col("t")).as("b"))
        .select(col("b.keys")).as[Seq[String]].head()
      assert(buf.size <= k - 1, s"trial $trial: ${buf.size} candidates > k-1")
      assert(exactHot.subsetOf(buf.toSet),
        s"trial $trial: MG lost hot items ${exactHot -- buf.toSet}")
    }
  }

  test("q162's verified output is merge-order-free (equals plain groupBy)") {
    val build = SparkEntry.queries("q162_heavy_hitters")
    val a = build(spark, sf0001).collect().toSeq
    val b = build(spark, sf0001).collect().toSeq // second run, new partial merges
    assert(a == b)
  }

  test("triangle plan: no cartesian product, no nested loop") {
    val df = SparkEntry.queries("q164_triangles")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the single sanctioned BNLJ-free shape: stats ride a 1-row broadcast
    assert(df.count() == 1)
  }
}
