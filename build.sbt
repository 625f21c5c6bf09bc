ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "priority_data_pipeline_postgres_dbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
scalacOptions ++= Seq("-deprecation", "-unchecked")
Test / fork := true
run / fork := true
// Bench/Verify print machine-parsed JSON lines: sbt's default forked-run
// logger prefixes every stdout line with "[info] " and appends a
// "[success] Total time" trailer, which left the driver's BENCH capture
// `parsed: null` every round (VERDICT r8 task 2 — the compact line alone
// wasn't enough). Raw StdoutOutput + no success banner makes the LAST
// line of a bench run the bare compact JSON object.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // JVM-default TZ pinned too: Timestamp.valueOf literals in gates
  // and specs parse in the JVM default zone while pages, sidecar
  // bounds, and the DuckDB oracle's naive timestamps are UTC-anchored
  // — on a non-UTC machine every boundary-exact assertion would skew
  "-Duser.timezone=UTC",
  // 16g default: the 8g heap evicted persisted frames under the
  // artifact queries' memory pressure and made the hybrid-retrieval
  // bench key's spread roam 4-19 s (isolated medians were stable) —
  // the box has 128 GiB, local[32] wants the headroom
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
