ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kinesislambdademospark"
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
// The bench's driver contract is ONE parseable JSON line on stdout; sbt's
// default fork output strategy routes the forked JVM's stdout through the
// LoggedOutput logger, which prefixes every line with "[info] " — that
// decoration has broken the driver's JSON parse in every round
// (BENCH_rNN.json "parsed": null since r01). StdoutOutput passes the forked
// process's streams through undecorated.
outputStrategy := Some(StdoutOutput)
// ... and drop sbt's own trailing "[success] Total time ..." line so the
// bench's JSON really is the last line of stdout.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint cannot see
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// ExtensionsSpec exercises spark.sql.extensions — a STATIC conf read at
// SparkContext creation — so it gets its own forked JVM; every other
// suite shares one JVM (and one SparkSession) as before.
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val (iso, rest) =
    (Test / definedTests).value.partition(_.name == "graft.ExtensionsSpec")
  Seq(
    Tests.Group("extensions", iso, Tests.SubProcess(forkOpts)),
    Tests.Group("shared-session", rest, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
