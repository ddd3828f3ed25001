package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-component cost of QuantileSketch.bucketCol over the sf10 corpus —
  * binary-searching the round-13 q285 anomaly (a 60M-row aggregate whose
  * stage burned 3,300 CPU-s ≈ 55µs/row). Each leg runs TWICE so run-to-run
  * flap is visible next to the component deltas.
  */
object DiagBucketCost {
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
    import graft.operators.QuantileSketch.micros

    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        }
    })
    def li = graft.model.Tables.load(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("v"))
    def t(name: String)(c: => org.apache.spark.sql.Column): Unit =
      (1 to 2).foreach { rep =>
        val m0 = taskMs.get; val c0 = cpuNs.get; val t0 = System.nanoTime()
        li.select(c.as("x")).agg(max(col("x"))).collect()
        println(f"[diag] $name%-22s rep$rep wall ${(System.nanoTime() - t0) / 1e9}%6.1f s" +
          f"  task ${(taskMs.get - m0) / 1e3}%8.1f s  cpu ${(cpuNs.get - c0) / 1e9}%8.1f s")
      }

    val m = micros(col("v"))
    val am = abs(m)
    val blen = length(bin(am))
    val shift = greatest(blen - lit(5), lit(0))
    val p = pow(lit(2.0), shift.cast("double")).cast("long")
    val sign = when(m < 0, lit(-1L)).when(m > 0, lit(1L)).otherwise(lit(0L))

    t("const")   { lit(1L) }
    t("micros")  { m }
    t("abs")     { am }
    t("binlen")  { blen }
    t("pow2")    { p }
    t("shiftleft"){ expr("shiftleft(1L, greatest(length(bin(abs(CAST(CAST(v AS DECIMAL(18,6)) * 1000000 AS BIGINT)))) - 5, 0))") }
    t("pmod")    { pmod(am, p) }
    t("bucket")  { sign * (am - pmod(am, p)) }
    spark.stop()
  }
}
