package graft

import java.nio.file.{Files, Path, Paths}

/** Process-lifetime write-once cache for entries that must materialize an
  * on-disk artifact (CSV/JSONL/partitioned-parquet sinks, delete files,
  * bucketed tables, streaming foreachBatch output) before the query half
  * reads it back.
  *
  * The skip condition is a COMMIT MARKER, not bare directory existence: a
  * crashed earlier attempt leaves a partial directory behind, and
  * `Files.exists(dir)` would treat that debris as complete — every later
  * call in the process then computes on partial data (the round-4 st09
  * bench failure). `ensure` only skips when a previous call placed the
  * marker AFTER its write returned; an unmarked directory is deleted and
  * rebuilt, and a failed write deletes its own debris before rethrowing so
  * the next call starts clean instead of inheriting the poison.
  */
object TmpOutputs {

  /** Marks the whole multi-directory artifact as committed. Spark's file
    * index ignores `_`-prefixed files, so the marker is invisible to the
    * read-back (`_SUCCESS` is Spark's own per-directory marker — ours sits
    * a level above and must not collide with it). */
  val Marker = "_GRAFT_COMMITTED"

  private def markerOf(root: Path): Path = root.resolve(Marker)

  def committed(dir: String): Boolean = {
    val root = Paths.get(dir)
    Files.exists(markerOf(root)) && hasPayload(root)
  }

  /** Every committed artifact here has at least one payload entry beside
    * the marker (they all land parquet/CSV/JSON directories), so a
    * marker-ONLY directory is torn state, not a commit: a kill that lands
    * inside [[deleteRecursively]] (which removes nested payload before the
    * root-level marker) — or a pre-generation-token scratch dir inherited
    * through pid reuse — leaves exactly that shape, and trusting it makes
    * every later read of the artifact fail. Treat it as uncommitted. */
  private def hasPayload(root: Path): Boolean = {
    val stream = Files.list(root)
    try stream.anyMatch(p => p.getFileName.toString != Marker)
    finally stream.close()
  }

  /** Run `write` exactly once per process per `dir` (single-threaded
    * callers — Verify/Bench run entries sequentially; tests serialize on
    * this object). */
  def ensure(dir: String)(write: => Unit): Unit = synchronized {
    val root = Paths.get(dir)
    if (!committed(dir)) {
      // marker first: if the rebuild is killed mid-delete, the leftover
      // must read as UNcommitted, never as marker-over-partial-payload
      Files.deleteIfExists(markerOf(root))
      deleteRecursively(root)
      Files.createDirectories(root) // writers may expect the parent to exist
      try {
        write
        Files.createFile(markerOf(root))
      } catch {
        case e: Throwable => deleteRecursively(root); throw e
      }
    }
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach((q: Path) => { Files.deleteIfExists(q); () })
      finally walk.close()
    }
}
