ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dp3spark"
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
// forked run output goes straight to stdout (no "[info] " logger
// prefix) so Bench's single JSON line stays machine-parseable
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
  // 24g default: the sandbox has 128 GiB and one wobbling 8g JVM once
  // fabricated a 12x apparent bench regression (VERDICT r3) — headroom
  // is cheaper than a false alarm. Override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The full 93-query bench compiles ~2000 whole-stage-codegen classes
  // in one JVM; the JDK default 240m ReservedCodeCacheSize fills
  // mid-run, JIT compilation stops, and later queries run partially
  // interpreted (measured: d_jaccard_pairs 7.8 s inside the full
  // registry run vs 2.1 s in a 7-query run on an idle machine).
  "-XX:ReservedCodeCacheSize=1g",
)
