package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the checkpoint WAL behind TCP/UDP/MQTT sources:
  * segment persistence, multi-segment replay, committed-offset restore,
  * GC on commit, fail-fast on uncovered ranges.
  */
class LineBufferWalSpec extends AnyFunSuite {

  // LineBufferWal is private[sources]; a test-side forwarder in that
  // package exposes it
  import graft.sources.WalTestAccess

  test("planned batches replay across instances, spanning segments") {
    val dir = Files.createTempDirectory("graft-wal").toFile.getAbsolutePath
    val w1 = WalTestAccess.create(dir)
    WalTestAccess.persist(w1, 0, 3, Array(("a", 1L), ("b", 2L), ("c", 3L)))
    WalTestAccess.persist(w1, 3, 5, Array(("d", 4L), ("e", 5L)))
    // a fresh instance (the restarted query) serves any sub-range
    val w2 = WalTestAccess.create(dir)
    assert(WalTestAccess.maxPlanned(w2) == 5L)
    assert(WalTestAccess.read(w2, 0, 5).map(_._1).toSeq == Seq("a", "b", "c", "d", "e"))
    assert(WalTestAccess.read(w2, 2, 4).map(_._1).toSeq == Seq("c", "d"))
    assert(WalTestAccess.read(w2, 4, 5).map(_._2).toSeq == Seq(5L))
  }

  test("commit persists the offset and drops covered segments") {
    val dir = Files.createTempDirectory("graft-wal").toFile.getAbsolutePath
    val w = WalTestAccess.create(dir)
    WalTestAccess.persist(w, 0, 2, Array(("a", 1L), ("b", 2L)))
    WalTestAccess.persist(w, 2, 4, Array(("c", 3L), ("d", 4L)))
    WalTestAccess.commit(w, 2)
    val w2 = WalTestAccess.create(dir)
    assert(WalTestAccess.committed(w2) == 2L)
    // segment [0,2) is gone; [2,4) still replayable
    assert(WalTestAccess.read(w2, 2, 4).map(_._1).toSeq == Seq("c", "d"))
    intercept[IllegalArgumentException] {
      WalTestAccess.read(w2, 0, 2)
    }
  }

  test("uncovered ranges fail fast instead of returning partial data") {
    val dir = Files.createTempDirectory("graft-wal").toFile.getAbsolutePath
    val w = WalTestAccess.create(dir)
    WalTestAccess.persist(w, 0, 2, Array(("a", 1L), ("b", 2L)))
    intercept[IllegalArgumentException] {
      WalTestAccess.read(w, 0, 5) // asks past what was ever planned
    }
  }

  test("lines containing tabs, newlines, and backslashes survive the WAL") {
    val dir = Files.createTempDirectory("graft-wal").toFile.getAbsolutePath
    val w = WalTestAccess.create(dir)
    val nasty = Array(
      ("col1\tcol2\tcol3", 9L),
      ("multi\nline\r\npayload", 10L),
      ("back\\slash\\n literal", 11L))
    WalTestAccess.persist(w, 0, 3, nasty)
    val got = WalTestAccess.read(WalTestAccess.create(dir), 0, 3)
    assert(got.toSeq == nasty.toSeq)
  }
}
