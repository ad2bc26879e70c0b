ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sentinelapyspark"
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
  // 8g measured BEST for the full 256-query sweep (r16 A/B: 214 s at
  // 8g vs 282 s at 16g, same code): Spark's ContextCleaner piggybacks
  // on GC, so a roomier heap lets shuffle/broadcast/checkpoint state
  // from ~250 prior queries accumulate mid-sweep and the sweep
  // degrades in a band; the tight heap keeps cleanup continuous.
  // Short filtered runs CAN be GC-bound at 8g (q144+q242 paired
  // measured 12.6 s at 8g vs 2.4 s at 16g) — use SPARK_DRIVER_MEM for
  // those, the full-sweep default stays 8g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
