package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query at SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout (driver contract).
  *
  * Each query is forced through the noop sink so the FULL plan executes
  * (a bare count() would let Catalyst prune the projected columns and
  * under-report scan/compute cost). One warmup query amortizes JVM/codegen
  * startup out of the first measurement.
  *
  * Per query the MEDIAN of SPARK_GRAFT_REPS (default 3) runs is reported:
  * single-shot timings on a shared host carry a documented ±40% noise band
  * (BASELINE.md), which made round-over-round regressions unattributable.
  * The dedup family's shared shingle/signature/pair stage (SharedStages) is
  * built once and timed as its own `shared_stage_build` entry — with
  * medians, the one-time build would otherwise vanish from every consumer's
  * median (first rep builds, later reps reuse), silently under-reporting
  * the suite. `total` = sum of query medians + the stage build.
  *
  * Next to each wall-clock median, `task_sec` carries the summed executor
  * task run time (SparkListener onTaskEnd, executorRunTime) of the SAME
  * rep whose wall-clock was the median. Wall-clock on a shared host moves
  * with external load; summed task time is work actually executed —
  * round-over-round comparisons should prefer it (`task_total` at the
  * top level). Streaming-harness queries (q66/q70/q71/q76/q85) still
  * include their source-write/read-back scaffolding in both numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Rehearsal knob: on a real cluster shuffle partitions grow with the
    // data (the fixed-32 default models the driver's local[32] gate, not a
    // 100 TB deployment). The sf10 scale runs use this to measure the
    // partition-scaling law directly — same code, partitions sized to SF.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // perf harness: no hash oracle runs here, and at rehearsal SFs
      // (sf1/sf10) aggregate sums legitimately cross the 2^53·1e-6
      // terminal-DOUBLE bound the correctness gate enforces — the guard
      // belongs to Verify, not to throughput measurement
      .config(queries.Protocol.GuardConfKey, "off")
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

    // summed executor task run time, attributed per run by snapshotting
    // around it (queries run sequentially; the bus is drained at each edge)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    // jvmGCTime attribution: executorRunTime INCLUDES time the task spent
    // blocked in GC, so a heap-pressured suite inflates task_sec without
    // any extra work executed. gc_sec separates the two — a query whose
    // full-suite task_sec is 3× its isolated run but whose gc share grew
    // the same 3× is suffering the harness heap, not a plan regression
    // (exactly the r8→r9 q164/q215 ambiguity this field was added for).
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { taskMs.addAndGet(m.executorRunTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })
    def drain(): Unit =
      try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000)
      catch { case _: Throwable => }

    def timed(run: () => Unit): (Double, Double, Double) = {
      drain()
      val task0 = taskMs.get
      val gc0 = gcMs.get
      val t0 = System.nanoTime()
      val ok = try { run(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] failed: ${e.getMessage}"); false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      drain()
      val taskSec = (taskMs.get - task0) / 1e3
      val gcSec = (gcMs.get - gc0) / 1e3
      // after timing: unpersist cost isn't the query's; the GC lets the
      // ContextCleaner reap dead broadcasts/shuffles between runs (their
      // cleanup is reference-triggered and otherwise lands inside a later
      // run's measurement)
      spark.catalog.clearCache()
      System.gc()
      if (ok) (elapsed, taskSec, gcSec) else (-1.0, -1.0, -1.0)
    }
    // a failed run reports -1, never a fast fake success — the baseline
    // gate must see breakage, not a speedup; one failure poisons the median.
    // task_sec/gc_sec report the SAME rep as the wall-clock median, so the
    // numbers describe one run.
    def median(run: () => Unit): (Double, Double, Double) = {
      val ts = (1 to reps).map(_ => timed(run))
      if (ts.exists(_._1 < 0)) (-1.0, -1.0, -1.0)
      else ts.sortBy(_._1).apply(ts.length / 2)
    }

    // the one-time shared-stage materializations, timed on their own
    // (dedupClusters builds shingles → sigs → pairs → cluster map;
    // copurchasePairs lands the order-items incidence + pair-support table
    // the graph/basket family reads — r13, guide §2.4). With reps>1
    // medians, a lazily-built stage would vanish from its first consumer's
    // median (rep 1 builds, later reps reuse), silently under-reporting
    // the suite — so each stage is forced and timed explicitly here.
    val stageBuild = timed(() => force(queries.SharedStages.dedupClusters(spark, sfDir)))
    val copairBuild = timed(() => force(queries.SharedStages.copurchasePairs(spark, sfDir)))

    // SPARK_GRAFT_ONLY=q164_triangles,q116_... restricts the run — the sf1
    // scale-rehearsal path measures just the expensive tail instead of
    // paying the full 230-query sweep at 10× data.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        name -> median(() => force(fn(spark, sfDir)))
      } :+ ("shared_stage_build" -> stageBuild) :+ ("copair_stage_build" -> copairBuild)
    val qs = results.map { case (k, (w, _, _)) => "\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val task = results.map { case (k, (_, t, _)) => "\"" + k + "\":" + t }
      .mkString("{", ",", "}")
    val gc = results.map { case (k, (_, _, g)) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val taskTotal = results.map(_._2._2).filter(_ >= 0).sum
    val gcTotal = results.map(_._2._3).filter(_ >= 0).sum
    // `queries` (driver contract) = WALL seconds; the same map is repeated
    // under the explicit `wall_sec` key so a truncated or reordered tail can
    // never be mistaken for the task-time map (the r4/r5 VERDICT caught
    // exactly that unit mixup) — every per-query map in this line is
    // labeled with its unit in its own key.
    // self-describing run config: the r9 scale rehearsals produced bench
    // files whose partition count and state-store provider had to be
    // reconstructed from shell history — record them in the line itself
    val provider = spark.conf
      .get("spark.sql.streaming.stateStore.providerClass", "")
      .split("\\.").lastOption.filter(_.nonEmpty).getOrElse("HDFSBackedStateStoreProvider")
    val full = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""wall_total":$total,"task_total":$taskTotal,"gc_total":$gcTotal,""" +
      s""""cpus":$cpus,"shuffle_partitions":$shufflePartitions,""" +
      s""""state_provider":"$provider",""" +
      s""""wall_sec":$qs,"task_sec":$task,"gc_sec":$gc,"queries":$qs,""" +
      s""""sf":"$sfDir","reps":$reps}"""
    println(full)
    // The driver captures only a ~2000-char stdout TAIL: the full per-query
    // line (~25 KB for 230 queries) gets its head truncated there and can
    // never re-parse (BENCH_r05/r06 both recorded "parsed": null). So the
    // full line also lands in out/bench.json deterministically, and the
    // LAST thing printed is a compact summary line that fits the tail
    // window whole — totals plus the slowest queries (the ones a baseline
    // comparison actually reads; the complete map is in the file).
    // BEFORE overwriting bench.json, load the previous run's per-query map:
    // the closing "delta" line (r14, VERDICT item 2) reports round-over-round
    // movers against it — the only per-query signal that can ever fit the
    // driver's tail window whole.
    val prevWall: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("out/bench.json")), "UTF-8")
        val m = """"wall_sec":\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1))
        m.map(_.split(",").flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) => Some(k.stripPrefix("\"").stripSuffix("\"") -> v.toDouble)
            case _ => None
          }
        }.toMap).getOrElse(Map.empty)
      } catch { case _: Throwable => Map.empty }
    new java.io.File("out").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("out/bench.json"), full + "\n")
    val slowest = results.filter(_._2._1 >= 0).sortBy(-_._2._1).take(8)
      .map { case (k, (w, _, _)) => "\"" + k + "\":" + math.round(w * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""wall_total":$total,"task_total":$taskTotal,""" +
      s""""n_queries":${results.length},"queries":$slowest,""" +
      s""""queries_truncated_to_slowest":8,""" +
      s""""detail":"out/bench.json","sf":"$sfDir","reps":$reps}""")
    // LAST line: per-query MOVERS vs the previous out/bench.json — queries
    // whose wall changed >10% AND >0.15 s (absolute floor keeps planning
    // noise on sub-second entries out), largest absolute delta first,
    // truncated so the line always fits a 2 KB tail window. Values are
    // [prev, now] rounded to ms. Totals ride along so the line alone
    // supports a round-over-round verdict even when nothing moved.
    if (prevWall.nonEmpty) {
      def r3(x: Double) = math.round(x * 1000) / 1000.0
      val movers = results.filter(_._2._1 >= 0).flatMap { case (k, (w, _, _)) =>
        prevWall.get(k).filter(p => p > 0 &&
          math.abs(w - p) / p > 0.10 && math.abs(w - p) > 0.15)
          .map(p => (k, p, w))
      }.sortBy { case (_, p, w) => -math.abs(w - p) }
      val prevTotal = r3(prevWall.values.filter(_ >= 0).sum)
      val head = s"""{"metric":"delta","unit":"sec","prev_total":$prevTotal,""" +
        s""""total":${r3(total)},"n_movers":${movers.length},"movers":{"""
      val tail2 = s"""},"sf":"$sfDir"}"""
      val budget = 1900 - head.length - tail2.length
      val items = new StringBuilder
      var used = 0
      var shown = 0
      movers.foreach { case (k, p, w) =>
        val item = "\"" + k + "\":[" + r3(p) + "," + r3(w) + "]"
        val need = item.length + (if (shown > 0) 1 else 0)
        if (used + need <= budget) {
          if (shown > 0) items.append(",")
          items.append(item); used += need; shown += 1
        }
      }
      println(head + items.toString + tail2)
    }
    // Providers first, session second: a still-loaded RocksDB provider
    // SIGSEGVs in its JNI log callback if the JVM exits under it (see
    // GraftSqlBridge.stopStateStores).
    org.apache.spark.sql.GraftSqlBridge.stopStateStores()
    spark.stop()
  }
}
