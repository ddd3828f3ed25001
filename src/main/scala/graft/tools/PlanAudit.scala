package graft.tools
import org.apache.spark.sql.SparkSession
/** Prints condensed physical plans for representative declared queries —
  * the pushdown/broadcast/codegen audit (run per round, paste into PLANS.md). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sp = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val interesting = args.headOption.map(_.split(",").toSeq).getOrElse(Seq(
      "q01_filter_project", "q04_join_agg", "q05_join3_month", "q08_semi_join",
      "q16_window_rank", "q26_vector_topk", "q32_minhash_pairs", "q37_range_join"))
    interesting.foreach { name =>
      val df = graft.SparkEntry.queries(name)(sp, dir)
      println(s"===== $name =====")
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema")
          || l.contains("Exchange") || l.contains("Broadcast") || l.contains("Join")
          || l.contains("TakeOrdered") || l.contains("HashAggregate") || l.contains("WholeStageCodegen"))
        .map(_.trim.take(220)).foreach(println)
    }
    sp.stop()
  }
}
