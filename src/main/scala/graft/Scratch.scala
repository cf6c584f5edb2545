package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-dir hygiene. All graft scratch (entry warehouses, streaming
  * checkpoints, RDD checkpoint dirs, TmpOutputs artifacts) lives under
  * `java.io.tmpdir` in per-process dirs named `graft-<tag>-<procToken>` —
  * which on this build is tmpfs (build.sbt points java.io.tmpdir at
  * /dev/shm when present), so abandoned dirs cost RAM, not disk. A crashed
  * or killed run can't clean after itself; instead every Bench/Verify
  * startup sweeps dirs whose owning process is dead.
  */
object Scratch {

  /** Per-process scratch suffix: `<pid>t<startEpochMillis>`. The start
    * time is load-bearing, not decoration: this host's pid_max is 32768
    * and a single local[32] Spark run burns hundreds of pids on threads,
    * so a fresh JVM can inherit a dead predecessor's pid within hours.
    * With bare-pid names that predecessor's dirs alias OURS — the sweeper
    * skips them as "self" and TmpOutputs then trusts a stale (possibly
    * torn) artifact. The start-time token makes each process GENERATION
    * unique, so an aliased dir is recognized as stale and swept. Falls
    * back to bare pid on platforms where the start instant is unreadable
    * (then legacy liveness-only sweeping applies). */
  val procToken: String = {
    val self = ProcessHandle.current()
    val start = self.info().startInstant()
    if (start.isPresent) s"${self.pid()}t${start.get.toEpochMilli}"
    else self.pid().toString
  }

  private val PidDir = "^graft-.+-(\\d+)$".r
  private val PidStartDir = "^graft-.+-(\\d+)t(\\d+)$".r

  private def startMillisOf(h: ProcessHandle): Option[Long] = {
    val s = h.info().startInstant()
    if (s.isPresent) Some(s.get.toEpochMilli) else None
  }

  /** Delete sibling scratch dirs owned by process generations that no
    * longer exist. LIVENESS ONLY for legacy bare-pid names — no age-based
    * fallback: a directory's mtime does not update when files change in
    * nested subdirectories, so an "untouched for N hours" rule would sweep
    * a long-running session's warehouse out from under it. For
    * `<pid>t<start>` names the start time disambiguates pid reuse: a live
    * pid whose start instant differs from the dir's token belongs to a
    * DEAD generation (possibly our own predecessor) and is swept; an
    * unreadable start instant keeps the dir (conservative). Dirs without
    * a pid suffix (test-suite createTempDirectory leftovers, random
    * digits with no dash) are left alone — small, and tmpfs clears on
    * reboot. */
  def sweepStale(): Unit = {
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    if (!Files.isDirectory(tmp)) return
    val self = ProcessHandle.current().pid()
    val selfStart = startMillisOf(ProcessHandle.current())
    val stream = Files.list(tmp)
    try stream.forEach { p =>
      val stale = p.getFileName.toString match {
        case PidStartDir(pid, start)
            if pid.toLongOption.isDefined && start.toLongOption.isDefined =>
          if (pid.toLong == self) !selfStart.contains(start.toLong)
          else {
            val h = ProcessHandle.of(pid.toLong)
            if (!h.isPresent) true
            else startMillisOf(h.get).exists(_ != start.toLong)
          }
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
