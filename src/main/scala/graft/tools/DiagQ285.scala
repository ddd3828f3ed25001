package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Leg-level task attribution for q285 at a rehearsal SF — the round-13
  * anomaly: the gate plan is right (persisted 2k-row sketch, 3-row
  * broadcast est, ONE audit corpus scan) yet sf10 measured ~3,500 task-s
  * where q286's identical audit leg measures <300. Times each leg alone.
  */
object DiagQ285 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/out/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.QuantileSketch

    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    def t(name: String)(f: => Unit): Unit = {
      val m0 = taskMs.get; val t0 = System.nanoTime()
      f
      println(f"[diag] $name%-28s wall ${(System.nanoTime() - t0) / 1e9}%7.1f s" +
        f"  task ${(taskMs.get - m0) / 1e3}%8.1f s")
    }

    val li = graft.model.Tables.load(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("v"))
    t("scan+count") { li.count() }
    t("delta-agg") { QuantileSketch.delta(li, "v").count() }
    val sk = QuantileSketch.delta(li, "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sk-materialize") { sk.count() }
    val est = QuantileSketch.quantiles(sk, Seq(500000L, 900000L, 990000L))
      .withColumn("ub", QuantileSketch.upperBoundCol(col("est_micros")))
    t("quantiles-est") { est.collect() }
    t("audit-bnlj") {
      li.select(QuantileSketch.micros(col("v")).as("m"))
        .crossJoin(broadcast(est))
        .groupBy(col("q_ppm"), col("rank"), col("est_micros"))
        .agg(sum(when(col("m") < col("est_micros"), 1L).otherwise(0L)).as("r_lt"),
          sum(when(col("m") < col("ub"), 1L).otherwise(0L)).as("r_ub"))
        .collect()
    }
    // the audit with est frozen to literals — takes the est subtree out
    val lits = est.collect().toSeq
    import spark.implicits._
    val estLit = lits.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toDF("q_ppm", "rank", "est_micros", "ub")
    // bin()-string vs arithmetic bit length: bin() mints a java String per
    // ROW; the arithmetic cascade is pure long ops in codegen
    t("bitlen-via-bin") {
      li.select(length(bin(abs(QuantileSketch.micros(col("v"))))).as("b"))
        .agg(max(col("b"))).collect()
    }
    t("bitlen-arith") {
      val m = abs(QuantileSketch.micros(col("v")))
      li.select(m.as("am"))
        .select(expr(
          """(CASE WHEN am >= 4294967296 THEN 32 ELSE 0 END
            | + CASE WHEN (am >> (CASE WHEN am >= 4294967296 THEN 32 ELSE 0 END)) >= 65536 THEN 16 ELSE 0 END)""".stripMargin).as("b"))
        .agg(max(col("b"))).collect()
    }
    t("audit-literal-est") {
      li.select(QuantileSketch.micros(col("v")).as("m"))
        .crossJoin(broadcast(estLit))
        .groupBy(col("q_ppm"), col("rank"), col("est_micros"))
        .agg(sum(when(col("m") < col("est_micros"), 1L).otherwise(0L)).as("r_lt"),
          sum(when(col("m") < col("ub"), 1L).otherwise(0L)).as("r_ub"))
        .collect()
    }
    // repeats: separate steady-state cost from one-shot JIT/GC artifacts
    t("delta-agg-rep2") { QuantileSketch.delta(li, "v").count() }
    t("bitlen-via-bin-rep2") {
      li.select(length(bin(abs(QuantileSketch.micros(col("v"))))).as("b"))
        .agg(max(col("b"))).collect()
    }
    spark.stop()
  }
}
