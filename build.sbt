ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automlplatformwithtimeseriesdataspark"
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
// No "[success] Total time: …" trailer after a runMain: the bench
// driver parses the LAST stdout line as JSON, and sbt's success line
// displaced it in r9-r11 (exit codes are unaffected by this setting).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked runMain output goes STRAIGHT to stdout instead of through
// sbt's logger — no "[info] " prefix on the bench JSON line.
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
  // pin + pre-fault the heap: the bench harness calls System.gc()
  // between reps (so one query's garbage isn't billed to the next),
  // and on an elastic heap that full GC UNCOMMITS G1 regions — the
  // following allocation-heavy rep then pays region recommit + page
  // faults INSIDE the timed window (measured: text_containment sf1
  // warm 19-28 s unpinned vs 13-14 s pinned ≡ its solo number; the
  // effect compounds with session length and made the r13 sf1
  // in-bench read 51 s). Xms=Xmx stops the shrink; AlwaysPreTouch
  // moves first-touch faults to JVM start.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  // 220+ codegen'd queries in one JVM overflow the default 240 MB
  // code cache (flushing → recompilation churn late in the session)
  "-XX:ReservedCodeCacheSize=512m",
)
