package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The write-once guard must key on the COMMIT MARKER, not directory
  * existence: a partial directory from a crashed attempt has to be rebuilt,
  * and a failed write must clean its debris so the next call retries
  * (the round-4 st09 bench failure mode). */
class TmpOutputsSpec extends AnyFunSuite {

  private def freshDir(tag: String): String =
    Paths.get(sys.props("java.io.tmpdir"),
      s"graft-tmpoutputs-spec-$tag-${System.nanoTime()}").toString

  test("partial directory without marker is rebuilt; committed one is skipped") {
    val dir = freshDir("rebuild")
    // simulate a crashed earlier attempt: directory exists, no marker
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "part-00000.debris"), Array[Byte](1, 2, 3))
    var writes = 0
    TmpOutputs.ensure(dir) { writes += 1 }
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
    TmpOutputs.ensure(dir) { ran = true }
    assert(ran, "retry after failure must run the write again")
    assert(TmpOutputs.committed(dir))
    TmpOutputs.deleteRecursively(Paths.get(dir))
  }
}
