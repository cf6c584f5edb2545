package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-dir hygiene. All graft scratch (entry warehouses, streaming
  * checkpoints, RDD checkpoint dirs, TmpOutputs artifacts) lives under
  * `java.io.tmpdir` in per-process dirs named `graft-<tag>-<pid>` — which
  * on this build is tmpfs (build.sbt points java.io.tmpdir at /dev/shm
  * when present), so abandoned dirs cost RAM, not disk. A crashed or
  * killed run can't clean after itself; instead every Bench/Verify
  * startup sweeps dirs whose owning process is dead.
  */
object Scratch {

  private val PidDir = "^graft-.+-(\\d+)$".r

  /** Delete sibling scratch dirs owned by processes that no longer exist,
    * plus any other graft-* dir untouched for 6+ hours (test-suite
    * createTempDirectory leftovers carry a random suffix, not a pid).
    * Never touches the calling process's own dirs. */
  def sweepStale(): Unit = {
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    if (!Files.isDirectory(tmp)) return
    val self = ProcessHandle.current().pid()
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    val stream = Files.list(tmp)
    try stream.forEach { p =>
      val name = p.getFileName.toString
      val stale = name match {
        // toLongOption: temp-dir suffixes can be arbitrarily long digit
        // runs that only LOOK like a pid — treat overflow as not-a-pid
        case PidDir(pid) if pid.toLongOption.isDefined =>
          pid.toLong != self &&
            ProcessHandle.of(pid.toLong).map[Boolean](_ => false).orElse(true)
        case _ =>
          name.startsWith("graft-") &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: java.io.IOException => false })
      }
      if (stale)
        try TmpOutputs.deleteRecursively(p)
        catch { case _: java.io.IOException => () } // racing sweeper/user
    } finally stream.close()
  }
}
