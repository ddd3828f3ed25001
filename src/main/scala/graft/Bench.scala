package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query at SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout (driver contract).
  *
  * Each query is forced through the noop sink so the FULL plan executes
  * (a bare count() would let Catalyst prune the projected columns and
  * under-report scan/compute cost). One warmup query amortizes JVM/codegen
  * startup out of the first measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: JIT + codegen + parquet footers + shuffle/sort/exchange paths
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000)
      force(li.groupBy("l_returnflag").agg(sum("l_quantity")).orderBy("l_returnflag"))
    } catch { case _: Throwable => }

    // a failed query reports -1, never a fast fake success — the baseline
    // gate must see breakage, not a speedup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { force(fn(spark, sfDir)); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // after timing: unpersist cost isn't the query's; the GC lets the
      // ContextCleaner reap dead broadcasts/shuffles between queries (their
      // cleanup is reference-triggered and otherwise lands inside a later
      // query's measurement)
      spark.catalog.clearCache()
      System.gc()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
