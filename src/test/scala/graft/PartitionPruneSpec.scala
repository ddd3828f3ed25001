package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ScaleQueries, SharedStages}

/** Partition-pruning pins for the date-partitioned fact layout (q101/q102):
  * the layout itself (Hive-style d= dirs, one file per day), STATIC pruning
  * (literal predicate → directories never listed into the scan), and
  * DYNAMIC pruning (join-driven dynamicpruning subquery → only the dim's
  * surviving dates are opened). The oracle gate checks the same queries'
  * VALUES; these pins check the scan did not read what it must not read —
  * the difference between a correct query and a correct query that works
  * at 100 TB.
  */
class PartitionPruneSpec extends AnyFunSuite {
  import TestSpark._

  /** Execute and return the FINAL physical plan's file scans (post-AQE).
    * AQE wraps materialized stages in QueryStageExec LEAF nodes, so a plain
    * `plan.collect` never reaches the scans — descend into stage plans and
    * subqueries explicitly.
    */
  private def scansAfterExec(df: DataFrame): Seq[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec        => allScans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other =>
        (other.children ++ other.subqueries).flatMap(allScans)
    }
    df.collect()
    allScans(df.queryExecution.executedPlan).distinct
  }

  test("partitioned layout: 30 d= dirs, one file per day") {
    val root = Paths.get(SharedStages.partitionedEventsPath(spark, sf0001))
    val dayDirs = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("d=")).toSeq
    assert(dayDirs.size == 30, s"expected 30 day partitions, got ${dayDirs.size}")
    dayDirs.foreach { d =>
      val parts = Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
      assert(parts.size == 1, s"$d has ${parts.size} files, want 1")
    }
  }

  test("q101 static pruning: PartitionFilters present, 3 of 30 partitions read") {
    val df = ScaleQueries.queries("q101_partition_prune")(spark, sf0001)
    val scans = scansAfterExec(df)
    assert(scans.size == 1)
    val scan = scans.head
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("d#"),
      s"no partition filter in scan:\n$s")
    // driver-side metric "number of partitions read": the out-of-range 27
    // days were eliminated from the file listing, not filtered row-by-row
    assert(scan.metrics("numPartitions").value == 3,
      s"partitions read = ${scan.metrics("numPartitions").value}, want 3")
    assert(scan.metrics("numFiles").value == 3)
  }

  test("q102 DPP: dynamicpruning filter on the fact scan, 5 Monday partitions read") {
    val df = ScaleQueries.queries("q102_dpp_join")(spark, sf0001)
    val scans = scansAfterExec(df)
    // fact scan = the partitioned one (has a partition schema with `d`)
    val fact = scans.filter(_.relation.partitionSchema.fieldNames.contains("d"))
    assert(fact.size == 1, s"expected exactly one partitioned fact scan, got ${fact.size}")
    val scan = fact.head
    assert(scan.toString.contains("dynamicpruning"),
      s"fact scan carries no dynamicpruning predicate:\n$scan")
    // Jan 2024 Mondays: 1, 8, 15, 22, 29 → exactly 5 of 30 dirs opened
    assert(scan.metrics("numPartitions").value == 5,
      s"partitions read = ${scan.metrics("numPartitions").value}, want 5")
  }

  test("q101/q102 values match an unpartitioned full-scan twin") {
    // semantics parity locally (the driver's DuckDB oracle re-checks at sf0.01)
    val ev = graft.model.Tables.load(spark, sf0001, "events")
      .withColumn("d", to_date(col("ts")))

    val got101 = ScaleQueries.queries("q101_partition_prune")(spark, sf0001)
    val want101 = ev.filter(col("d").between(lit("2024-01-10"), lit("2024-01-12")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got101.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == want101.toSeq)

    val got102 = ScaleQueries.queries("q102_dpp_join")(spark, sf0001)
    val want102 = ev.filter(dayofweek(col("d")) === 2)
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(got102.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == want102.toSeq)
  }
}
