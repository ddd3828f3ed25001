ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "binancedatapipelineinawsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which corrupts the
// bench's one-line JSON contract for any consumer that parses stdout
// lines as JSON (the driver's BENCH_r05..r13 all recorded parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark generates a FRESH codegen class per query stage; HotSpot refuses
  // to JIT methods over 8000 bytecodes (DontCompileHugeMethods), so a wide
  // whole-stage-codegen method can run INTERPRETED forever — measured in
  // round 13 as a random 4-10x task-time inflation on single corpus-scan
  // stages at sf10 (q285: 2,597 -> 605 task-s under this flag; the same
  // plan flapped 205 vs 1,401 task-s between identical runs without it).
  // Standard Spark production setting; the larger code cache keeps the
  // many generated classes of a full suite run from evicting each other.
  "-XX:-DontCompileHugeMethods",
  // 1g (r13, was 512m): a full 295-query suite at reps=3 generates ~10^4
  // codegen classes; at 512m the cache fills mid-suite and
  // UseCodeCacheFlushing starts evicting WARM methods, which de-optimizes
  // a late query back to the interpreter — measured as a 20x task-time
  // flap on q287 (13 task-s isolated vs 266 in one full-suite run, same
  // code). The flag pair exists to keep generated methods compiled; the
  // larger cache keeps them compiled for the whole run.
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // Experiment passthrough: extra -Dspark.* system properties for forked
  // runs (SparkConf reads spark.* system props), e.g. a state-store
  // provider override for a scale rehearsal. Space-separated.
  sys.env.get("SPARK_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
