ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamsspringcloudstreamtp1spark"
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
  // 32 local executor threads share this one heap (local mode has no
  // separate executors); 8g left the 60-query bench GC-bound mid-suite
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Spark generates one Java class per plan; under a many-query session
  // HotSpot's default PerMethodRecompilationCutoff (400) permanently bans a
  // generated method from C2 after repeated deoptimizations, leaving that
  // plan interpreted FOREVER (measured in Bench: the same 5000-row
  // projection ran 0.5 s compiled vs 6-11 s once banned, pure CPU, zero GC
  // — the round-3/4 "in-suite 6-12x interference" postmortem). Raising the
  // cutoff lets deopt-churned generated code recompile instead.
  "-XX:PerMethodRecompilationCutoff=10000",
  // headroom for ~140 queries' generated classes (default 240m; a full code
  // cache silently disables the JIT, same interpreted-forever symptom)
  "-XX:ReservedCodeCacheSize=512m",
  // Janino compiled-class cache (STATIC SQL conf, so it must be on the JVM
  // command line / builder, not spark.conf.set). Default 100 entries is
  // smaller than one pass of the 141-query suite, so a second pass of the
  // same queries got ZERO cache hits: every plan re-compiled and re-loaded
  // a fresh generated class, and each class load invalidates CHA-based
  // speculative inlining in already-JIT-compiled code — a suite-wide
  // deopt/recompile storm. That was the round-6 bench pass-2 collapse
  // (269 s -> 624 s, 25 queries >3x slower warm, ~0 GC). Sized to hold
  // every generated class of the full suite so a warm pass loads nothing.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
)

// The round-driver records only the LAST 2000 chars of bench output; sbt's
// "[success] Total time ..." trailer (~80 chars) printed after Bench's
// single JSON line was clipping the line's head out of that window
// (BENCH_r04 was unparseable for exactly this reason). Suppress it so the
// JSON line is the last thing in the recorder's tail.
Global / showSuccess := false
// ... and drop sbt's "[info] " log prefix from the forked JVM's stdout —
// the bench JSON line should reach the recorder byte-identical.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
