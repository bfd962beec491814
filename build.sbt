ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ntparserspark"
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
// forked `run` output must reach stdout UNPREFIXED: the bench driver
// parses the single JSON line graft.Bench prints, and sbt's default
// logger prefix ("[info] ") breaks that contract (BENCH_r01 "parsed": null)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++
  // throughput GC: the parse kernel is allocation-heavy across 32 threads;
  // a large young gen keeps the short-lived per-triple garbage out of the
  // old gen (full GCs would otherwise dominate at local[32]). The young
  // gen is scaled from the resolved heap (~40%) so SPARK_DRIVER_MEM below
  // the old fixed -Xmn12g no longer fails JVM startup.
  sys.env.getOrElse("SPARK_GC", {
    // parse g/m suffixes so ANY heap size yields a valid young gen
    // (a fixed -Xmn larger than -Xmx fails JVM startup)
    val heapMb = "(?i)^(\\d+)([gm])$".r
      .findFirstMatchIn(sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))
      .map(m => m.group(1).toLong * (if (m.group(2).equalsIgnoreCase("g")) 1024 else 1))
      .getOrElse(32768L)
    s"-XX:+UseParallelGC -Xmn${math.max(256L, heapMb * 2 / 5)}m"
  }).split(" ").toSeq
