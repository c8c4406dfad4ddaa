ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "olistdatawarehousespark"
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
// The full suite is ~50 min in ONE forked JVM — longer than the round
// driver's test budget, so it could no longer independently confirm
// test health. Split the suites round-robin into a few forked JVMs
// that run CONCURRENTLY (each builds its own local[4] SparkSession
// over its own temp dirs; the only cross-JVM hazard would be a shared
// embedded-Derby system home, so each group gets its own). Suites were
// already independent — same tests, same assertions, same single-JVM
// behavior under `testOnly`.
val testForkGroups = 6
Test / testGrouping := {
  val suites = (Test / definedTests).value.sortBy(_.name)
  val fo = (Test / forkOptions).value
  suites.zipWithIndex.groupBy(_._2 % testForkGroups).toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"fork-$g", ts.map(_._1), Tests.SubProcess(
        fo.withRunJVMOptions(fo.runJVMOptions ++
          Vector(s"-Dderby.system.home=/tmp/derby-test-fork-$g"))))
    }
}
// sbt caps concurrently-running forked test groups at 1 by default
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkGroups),
  Tags.limitAll(math.max(testForkGroups + 2,
    java.lang.Runtime.getRuntime.availableProcessors())))
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
