package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-domain modules; each
  * module colocates every Spark builder with its DuckDB oracle so the two can
  * never drift apart silently.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    CoreQueries, EventQueries, TextQueries, VectorQueries,
    TextAnalysisQueries, DedupQueries, JoinOpQueries, MiscQueries,
    CoverageQueries, ScaleQueries, CurationQueries, MultimodalQueries,
    DecorrelationQueries, RecursionQueries, TpchQueries, RetrievalQueries,
    AnalyticsQueries, OptimizerQueries, StatQueries, GraphStatQueries,
    IntervalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the reference-mirror tumbling window (Q22) — the reference's core
    * semantic (`main.py:36-47`) as one Spark query.
    */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("q22_tumbling_window")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
