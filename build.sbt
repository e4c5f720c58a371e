ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "harbourbridgespark"
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
// Forked-run stdout goes straight through (no sbt "[info] " prefix) so the
// bench's single JSON line is machine-parseable from the sbt output.
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

// ---------------------------------------------------------------------------
// Optional external-client modules (modules/README.md). The default build
// excludes them: their dependencies (Cloud Spanner client, AWS SDK v2) are
// not in the zero-egress image, and everything above the client seams is
// compiled + tested in the main tree against injectable fakes. Set the env
// flag(s) on a machine with artifact access to compile the live glue and
// its env-gated integration suites.
val withSpanner = sys.env.contains("GRAFT_WITH_SPANNER")
val withAwsDynamo = sys.env.contains("GRAFT_WITH_AWS_DYNAMO")
Compile / unmanagedSourceDirectories ++=
  (if (withSpanner)
    Seq(baseDirectory.value / "modules" / "spanner" / "src" / "main" / "scala")
  else Seq.empty) ++
  (if (withAwsDynamo)
    Seq(baseDirectory.value / "modules" / "dynamodb" / "src" / "main" / "scala")
  else Seq.empty)
Test / unmanagedSourceDirectories ++=
  (if (withSpanner)
    Seq(baseDirectory.value / "modules" / "spanner" / "src" / "test" / "scala")
  else Seq.empty) ++
  (if (withAwsDynamo)
    Seq(baseDirectory.value / "modules" / "dynamodb" / "src" / "test" / "scala")
  else Seq.empty)
libraryDependencies ++=
  (if (withSpanner) Seq("com.google.cloud" % "google-cloud-spanner" % "6.71.0")
  else Seq.empty) ++
  (if (withAwsDynamo) Seq("software.amazon.awssdk" % "dynamodb" % "2.25.60")
  else Seq.empty)
