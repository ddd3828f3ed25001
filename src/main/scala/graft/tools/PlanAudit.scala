package graft.tools
import org.apache.spark.sql.SparkSession
/** Prints condensed physical plans for representative declared queries —
  * the pushdown/broadcast/codegen audit (run per round, paste into PLANS.md).
  *
  * Second arg `scale` simulates the 100 TB planning regime by setting
  * `spark.sql.autoBroadcastJoinThreshold=-1`: cost-based broadcasts (chosen
  * because a table *measures* small at test SF) disappear, so any
  * BroadcastExchange that SURVIVES is hint-forced and would still be forced
  * when the table is corpus-sized — i.e. a scale-killer. Intentional forced
  * broadcasts of genuinely bounded tables (dims, centroid models, eval sets)
  * are expected to appear; a forced broadcast of a per-document/per-fact
  * table is a bug.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val scaleMode = args.length > 1 && args(1) == "scale"
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false")
    if (scaleMode) b.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val sp = b.getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val interesting = args.headOption.filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Seq(
      "q01_filter_project", "q04_join_agg", "q05_join3_month", "q08_semi_join",
      "q16_window_rank", "q26_vector_topk", "q32_minhash_pairs", "q37_range_join",
      // round-4 representatives: native as-of, shared-stage consumer,
      // curation composition, one-scan TF-IDF
      "q74_asof_native", "q60_dedup_clusters", "q82_curated_corpus", "q72_tfidf",
      // round-5: JDBC scan pushdown (PushedFilters must reach the database)
      "q59_jdbc_roundtrip"))
    interesting.foreach { name =>
      val df = graft.SparkEntry.queries(name)(sp, dir)
      println(s"===== $name${if (scaleMode) " [scale: auto-broadcast off]" else ""} =====")
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema")
          || l.contains("Exchange") || l.contains("Broadcast") || l.contains("Join")
          || l.contains("TakeOrdered") || l.contains("HashAggregate") || l.contains("WholeStageCodegen")
          || l.contains("InMemoryTableScan"))
        .map(_.trim.take(220)).foreach(println)
    }
    sp.stop()
  }
}
