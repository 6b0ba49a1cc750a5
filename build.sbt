ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce_infrastructurespark"
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
// Forked output passes through unprefixed: sbt's default logger prepends
// "[info] " to every forked-process line, which breaks a strict JSON parse
// of Bench's final metric line by the driver.
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
// Shuffle/spill and JVM temp files go to tmpfs: the box's buffered-disk
// writeback is intermittently throttled to ~15 MB/s (measured with dd
// against the ~200 MB/s direct-I/O rate), which is the root cause of the
// multi-round phantom 2-10x bench swings on unchanged code — shuffle
// writes crawl whenever the throttle is active. Local-mode shuffle volume
// at sf<=0.1 is MBs against a 63 GiB tmpfs, and Spark's shutdown hooks
// remove both dirs' contents on normal exit. (On a real cluster local
// dirs are per-node fast disks — this is the single-box equivalent.)
// Guarded: hosts without /dev/shm (macOS, slim containers) fall back to the
// default tmp dirs instead of failing the build load, and the paths are
// user-scoped so checkouts on a multi-user box don't collide.
val tmpfsOpts: Seq[String] = {
  if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) {
    val user = sys.props.getOrElse("user.name", "anon")
    val local = s"/dev/shm/graft-$user-spark-local"
    val tmp = s"/dev/shm/graft-$user-tmp"
    Seq(local, tmp).foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    Seq(s"-Dspark.local.dir=$local", s"-Djava.io.tmpdir=$tmp")
  } else Seq.empty
}
javaOptions ++= jdk17AddOpens ++ tmpfsOpts ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g default: the box has 128 GiB and the bench runs 70+ queries x N
  // iterations in one JVM with session-scoped persisted caches — at 8g the
  // r5 bench degraded as it aged (q58 runs 25->41->76s) from storage/
  // execution memory contention and GC churn.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
