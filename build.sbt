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
  // 0.5 GiB/core for the local[32] bench/verify JVMs (guide §5: memory
  // per CONCURRENT TASK is what bounds execution memory). The old 8g
  // (0.25 GiB/core) was GC-bound: two parse-heavy queries benched
  // back-to-back at 32 threads measured 4-6x their solo wall purely
  // from collector pressure (q144+q242 12.6 s paired at 8g vs 2.4 s
  // at 16g, solo 1.1+1.7 s), and the full-sweep run-to-run spread
  // (±50% on 2-4 s queries) shrinks with the heap. The box has
  // 128 GiB; tests fork with the same option.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
