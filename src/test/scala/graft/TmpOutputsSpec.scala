package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The write-once guard must key on the COMMIT MARKER, not directory
  * existence: a partial directory from a crashed attempt has to be rebuilt,
  * and a failed write must clean its debris so the next call retries
  * (the round-4 st09 bench failure mode). A marker with NO payload beside
  * it is torn state (kill inside the rebuild's delete, or a bare-pid-era
  * scratch dir inherited through pid reuse) and must also rebuild — that
  * was the round-14 st09 Verify flake. */
class TmpOutputsSpec extends AnyFunSuite {

  private def freshDir(tag: String): String =
    Paths.get(sys.props("java.io.tmpdir"),
      s"graft-tmpoutputs-spec-$tag-${System.nanoTime()}").toString

  private def payload(dir: String): Unit = {
    Files.write(Paths.get(dir, "part-00000.out"), Array[Byte](1))
    ()
  }

  test("partial directory without marker is rebuilt; committed one is skipped") {
    val dir = freshDir("rebuild")
    // simulate a crashed earlier attempt: directory exists, no marker
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "part-00000.debris"), Array[Byte](1, 2, 3))
    var writes = 0
    TmpOutputs.ensure(dir) { writes += 1; payload(dir) }
    assert(writes === 1, "unmarked (partial) directory must trigger a rewrite")
    assert(!Files.exists(Paths.get(dir, "part-00000.debris")), "debris must be cleared")
    assert(TmpOutputs.committed(dir))
    TmpOutputs.ensure(dir) { writes += 1 }
    assert(writes === 1, "committed directory must be skipped")
    TmpOutputs.deleteRecursively(Paths.get(dir))
  }

  test("failed write deletes its debris and the next call retries cleanly") {
    val dir = freshDir("retry")
    intercept[RuntimeException] {
      TmpOutputs.ensure(dir) {
        Files.write(Paths.get(dir, "half-written"), Array[Byte](1))
        throw new RuntimeException("simulated crash mid-write")
      }
    }
    assert(!Files.exists(Paths.get(dir)), "failed write must remove its directory")
    var ran = false
    TmpOutputs.ensure(dir) { ran = true; payload(dir) }
    assert(ran, "retry after failure must run the write again")
    assert(TmpOutputs.committed(dir))
    TmpOutputs.deleteRecursively(Paths.get(dir))
  }

  test("marker with no payload is torn state: not committed, rebuilt") {
    val dir = freshDir("torn")
    Files.createDirectories(Paths.get(dir))
    Files.createFile(Paths.get(dir, TmpOutputs.Marker))
    assert(!TmpOutputs.committed(dir), "a payload-less marker must not read as committed")
    var writes = 0
    TmpOutputs.ensure(dir) { writes += 1; payload(dir) }
    assert(writes === 1, "torn directory must trigger a rewrite")
    assert(TmpOutputs.committed(dir))
    assert(Files.exists(Paths.get(dir, "part-00000.out")))
    TmpOutputs.deleteRecursively(Paths.get(dir))
  }

  test("sweepStale keys on process GENERATION, not bare pid") {
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    val self = ProcessHandle.current().pid()
    val mine = tmp.resolve(s"graft-swspec-${Scratch.procToken}")
    // same pid, different start instant = a dead predecessor that
    // happened to get our pid — must be swept, not protected as "self"
    val aliased = tmp.resolve(s"graft-swspec-${self}t12345")
    // legacy bare-pid name owned by a pid that cannot exist (pid_max is
    // far below this) — liveness sweep must still collect it
    val deadLegacy = tmp.resolve("graft-swspec-999999999")
    Seq(mine, aliased, deadLegacy).foreach(Files.createDirectories(_))
    try {
      Scratch.sweepStale()
      assert(Files.exists(mine), "own-generation dir must survive the sweep")
      assert(!Files.exists(aliased), "same-pid different-generation dir must be swept")
      assert(!Files.exists(deadLegacy), "dead-pid legacy dir must be swept")
      // a LIVE foreign pid with a mismatched start instant is a reused
      // pid — swept when its start is readable (skip quietly if not)
      val init = ProcessHandle.of(1L)
      if (init.isPresent && init.get.info().startInstant().isPresent) {
        val reused = tmp.resolve("graft-swspec-1t12345")
        Files.createDirectories(reused)
        Scratch.sweepStale()
        assert(!Files.exists(reused), "live-pid wrong-generation dir must be swept")
      }
    } finally Seq(mine, aliased, deadLegacy)
      .foreach(p => TmpOutputs.deleteRecursively(p))
  }
}
