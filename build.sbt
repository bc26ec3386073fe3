ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamingamqpspark"
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
  // local[32] = driver-only execution: the heap IS the cluster memory.
  // Fixed-size heap (Xms=Xmx) so G1 never uncommits/recommits — but NO
  // AlwaysPreTouch and NO TransparentHugePages: on this Firecracker
  // kernel the parallel pretouch of a 16g heap burns 40+ CPU-MINUTES of
  // kernel page-fault time before main() runs (measured: `java -Xms16g
  // -XX:+AlwaysPreTouch -version` = 124s wall / 42min sys; with THP
  // 270s / 102min), which is what timed out the round-1 driver gate.
  // Lazy 4K faulting costs ~1.7s sys/GiB actually used — pay only that.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
  "-XX:ReservedCodeCacheSize=1g",
)
