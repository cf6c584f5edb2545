ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergtoolsspark"
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
// Bench/Verify emit machine-parsed stdout (Bench's single JSON metric
// line). Two sbt behaviors break a "parse the last stdout line" consumer:
// the default LoggedOutput strategy prefixes every forked line with
// "[info] ", and sbt prints a "[success] Total time ..." footer AFTER the
// forked JVM exits. Raw pass-through + no footer make the JSON line the
// genuine last line of the process's stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command layer, not the task graph — the
// unused-key lint cannot see that
Global / excludeLintKeys += showSuccess
// forward stdin to forked `run` so `manifest2json -` (stdin source) works
run / connectInput := true
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
// Scratch on tmpfs when the host has one: streaming checkpoint/offset
// logs, entry warehouses, RDD checkpoints and shuffle spill all derive
// their location from java.io.tmpdir, and every one of them is
// fsync-heavy — on a loaded host a disk-backed /tmp turns that into
// multi-second timing outliers (the r13 bench recorded 150 s for a
// 60-70 s suite). RAM-backed scratch is the same choice a production
// cluster makes with NVMe/ramdisk local dirs; durable artifacts
// (testdata, verify outDir, the repo) are addressed absolutely and
// unaffected. graft.Scratch.sweepStale bounds accumulation across runs.
javaOptions ++= {
  val shm = file("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = shm / "graft-scratch"
    java.nio.file.Files.createDirectories(d.toPath)
    Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}")
  } else Seq.empty
}
