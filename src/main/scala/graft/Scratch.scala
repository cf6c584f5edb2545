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

  /** Delete sibling scratch dirs owned by processes that no longer
    * exist. LIVENESS ONLY — no age-based fallback: a directory's mtime
    * does not update when files change in nested subdirectories, so an
    * "untouched for N hours" rule would sweep a long-running session's
    * warehouse out from under it. Dirs without a pid suffix (test-suite
    * createTempDirectory leftovers, random digits with no dash) are
    * left alone — small, and tmpfs clears on reboot. */
  def sweepStale(): Unit = {
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    if (!Files.isDirectory(tmp)) return
    val self = ProcessHandle.current().pid()
    val stream = Files.list(tmp)
    try stream.forEach { p =>
      val stale = p.getFileName.toString match {
        // toLongOption: temp-dir suffixes can be arbitrarily long digit
        // runs that only LOOK like a pid — treat overflow as not-a-pid
        case PidDir(pid) if pid.toLongOption.isDefined =>
          pid.toLong != self &&
            ProcessHandle.of(pid.toLong).map[Boolean](_ => false).orElse(true)
        case _ => false
      }
      if (stale)
        try TmpOutputs.deleteRecursively(p)
        catch { case _: java.io.IOException => () } // racing sweeper/user
    } finally stream.close()
  }
}
