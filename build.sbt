ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prqlqueryspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // DuckDB JDBC driver (cached offline): backs the `-d duckdb://file`
  // connector — the reference README's own example (README.md:204) opens
  // a .duckdb database file directly. Runtime-only surface (loaded via
  // DriverManager/Class.forName, never imported).
  "org.duckdb" % "duckdb_jdbc" % "1.0.0",
)
Test / fork := true
run / fork := true
// Pass the forked process's output through raw instead of re-logging each
// line with an [info]/[error] prefix: the bench driver tail-parses the last
// stdout JSON line, and sbt's logger both decorates it and reorders
// late-flushed stderr after it (BENCH_r0{2,3,4} recorded parsed:null).
run / outputStrategy := Some(StdoutOutput)
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
  // The full bench suite JIT-compiles ~120 codegen-heavy queries in one
  // JVM; JDK 17's default 240 MB code cache can fill, at which point
  // HotSpot silently stops compiling and trivial plans run interpreted at
  // 20-60x real-CPU cost (the leading suspect for round 8's q26 reading
  // 61 s of task CPU on a 1,000-row projection at unchanged code —
  // VERDICT r8). 512 MB gives 2x headroom; Bench.scala also reports
  // code-cache occupancy into bench_detail.json so a recurrence is
  // self-diagnosing rather than a mystery.
  "-XX:ReservedCodeCacheSize=512m",
  // Explicitly keep sweeping cold compiled methods when the cache gets
  // tight (the JDK default, pinned here so a toolchain change can't drop
  // it): with flushing off a full cache disables compilation PERMANENTLY
  // for the rest of the JVM — the r8/r11/r13 interpreted-execution
  // anomaly's worst case. Bench.scala records per-query CodeHeap
  // occupancy + delta in bench_detail.json so an outlier adjudicates
  // mechanically.
  "-XX:+UseCodeCacheFlushing",
  // JIT/deopt telemetry (round 15, the r8/r11/r13/r14 warm-JVM anomaly):
  // expose the JVM's own hsperf compiler counters (sun.ci.totalCompiles /
  // totalBailouts / totalInvalidates) to Bench.scala via the jvmstat
  // self-attach API so every per-query row carries a deopt-storm signal.
  // Reflective access only — compilation never depends on the module, and
  // Bench degrades silently where it's absent.
  "--add-modules", "jdk.internal.jvmstat",
  "--add-exports", "jdk.internal.jvmstat/sun.jvmstat.monitor=ALL-UNNAMED",
) ++
  // A/B escape hatch for JVM-mechanism experiments (e.g.
  // -XX:PerMethodRecompilationCutoff=-1, -XX:+LogCompilation): extra
  // flags ride an env var so a diagnostic run never edits the build.
  sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
