ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkadataexplorercdcspark"
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
// The driver parses the single JSON line graft.Bench prints: pass the
// forked JVM's stdout through verbatim (no "[info] " prefix) and drop
// sbt's trailing "[success] Total time" line so the JSON is last.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  // The container locale is POSIX, so JDK 17 defaults to US-ASCII —
  // and Spark's VARIANT builder goes through the platform charset, so
  // any non-ASCII string entering the variant tier silently corrupts
  // (measured: one U+FFFD round-tripped to three). JDK 18+ defaults to
  // UTF-8 (JEP 400); force it here. A production deployment carries
  // this in spark.{driver,executor}.extraJavaOptions the same way.
  "-Dfile.encoding=UTF-8",
  // 62 queries × local[32] shuffles in one JVM: 8g left ~10 s GC pauses
  // on the heavier CDC plans; the bench box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Return freed heap to the OS: G1 honors these on the full GCs
  // graft.Bench triggers between query families, so the sweep's RSS
  // tracks the live set instead of ratcheting toward -Xmx on a
  // memory-tight host (r15: three rounds of driver-side paging during
  // the bench window). 15/40, not the tighter 10/30 first tried:
  // shrinking to live+30% made every alloc-heavy query re-commit GBs
  // of heap inside its timed run (graph_lpa 3.8->7 s).
  "-XX:MinHeapFreeRatio=15", "-XX:MaxHeapFreeRatio=40",
  // ~100 queries × 2 runs of whole-stage-codegen classes overflow the
  // default 240 MB JIT code cache mid-suite; flushing then deopts hot
  // methods and the iterative queries (dedup_clusters) pay multi-second
  // re-JIT tails. 512 MB keeps the whole suite's generated code hot.
  "-XX:ReservedCodeCacheSize=512m",
  // Spark's generated-class cache (static conf) defaults to 100 LRU
  // entries — the ~100-query suite evicts constantly, so repeat runs
  // re-Janino-compile and re-JIT the same stages (measured as multi-
  // second bimodal per-query variance). Size it to hold the suite.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
) ++ sys.env.get("SPARK_GRAFT_JVM_DIAG").toSeq.flatMap(_ => Seq(
  // transient JIT diagnosis (set SPARK_GRAFT_JVM_DIAG=1): timestamped
  // compile/deopt events on stdout to correlate with slow bench runs
  "-XX:+PrintCompilation"))
