ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphmatspark"
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
// Forked-run output defaults to LoggedOutput, which prefixes every stdout
// line with "[info] " — that breaks any consumer parsing the LAST stdout
// line as JSON (Bench's driver contract). StdoutOutput passes the child's
// stdout/stderr through raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's trailing "[success] Total time" line so the child's
// final JSON really is the last stdout line of `sbt -batch "runMain ..."`.
ThisBuild / showSuccess := false
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
// Fixed heap + pre-touch: with a large -Xmx and a small initial heap, G1's
// incremental heap growth page-faults every fresh region under this engine's
// allocation pattern — measured 5-10x wall-clock on the superstep kernel at
// -Xmx89g. Committing (and touching) the whole heap up front removes it.
// The heap is CAPPED at 48g regardless of SPARK_DRIVER_MEM: a pre-touched
// 89g driver is ~99g RSS, and Bench's local-cluster legs spawn pre-touched
// executor JVMs next to it — on this 125g machine the kernel OOM-kills the
// driver (exit 137). 48g + the largest executor constellation stays under
// budget, and every measured working set fits in far less.
def capHeap(v: String): String = {
  val m = "([0-9]+)([gG])".r
  v match {
    case m(n, _) if n.toInt > 48 =>
      println(s"[build.sbt] SPARK_DRIVER_MEM=$v capped to 48g (pre-touched driver + executor JVMs must fit the 125g host)")
      "48g"
    case _ => v
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${capHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
  s"-Xms${capHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
// local-cluster[n,c,m] legs (Bench scaling proof) spawn standalone Workers
// in-process; without this they would scratch under $SPARK_HOME/work.
// and their launcher needs SPARK_SCALA_VERSION (normally exported by
// load-spark-env.sh, absent under sbt) to locate $SPARK_HOME/jars.
ThisBuild / Test / envVars ++= Map(
  "SPARK_WORKER_DIR" -> "/tmp/graft-worker", "SPARK_SCALA_VERSION" -> "2.13")
ThisBuild / run / envVars ++= Map(
  "SPARK_WORKER_DIR" -> "/tmp/graft-worker", "SPARK_SCALA_VERSION" -> "2.13")
