ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "expertsetlspark"
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
// Round 20 (VERDICT r19 item 2): the driver's `sbt test` budget was
// blown by ONE sequential test JVM using 4 of 32 cores (~30 min).
// Split the suites deterministically into forked groups that run in
// PARALLEL — each group is its own JVM with its own SparkSession
// (local[4], so 4 groups ≈ 16 cores), no shared-session conf races,
// same tests and assertions. Suites write only suite-unique table
// names / per-JVM temp dirs, so groups never collide on state.
val testGroupCount = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / forkOptions).value
  tests.zipWithIndex.groupBy(_._2 % testGroupCount).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts.map(_._1), Tests.SubProcess(opts))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors)),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// The driver parses Bench's single JSON stdout line; sbt's default
// LoggedOutput would prefix it with "[info] " and break json.loads.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
