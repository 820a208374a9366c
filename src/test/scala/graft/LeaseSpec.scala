package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Laws of the single-writer streaming-root lease ([[graft.io.Lease]]):
  * the front-door arbitration that keeps a second CLI off a shared
  * Spark checkpoint (the offset WAL the commit-log CAS cannot
  * protect — see the scaladoc's reproduced poisoned-resume race).
  */
class LeaseSpec extends AnyFunSuite with Matchers {
  private def fresh(): String =
    graft.io.Scratch.sub("lease_spec") + "/" +
      java.util.UUID.randomUUID().toString.take(8) + "/LEASE"

  test("a live lease refuses a second acquirer loudly; release frees " +
      "it for the next writer") {
    val path = fresh()
    val l1 = graft.io.Lease.acquire(path, heartbeatMs = 50,
      graceMs = 60000)
    val e = intercept[IllegalStateException] {
      graft.io.Lease.acquire(path, heartbeatMs = 50, graceMs = 60000)
    }
    e.getMessage should include("held by a live writer")
    l1.release()
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(path)) shouldBe false
    val l2 = graft.io.Lease.acquire(path, heartbeatMs = 50,
      graceMs = 60000)
    l2.release()
  }

  test("the heartbeat keeps a long-held lease live past the grace, " +
      "and a DEAD owner's stale lease is taken over after it") {
    val path = fresh()
    val l1 = graft.io.Lease.acquire(path, heartbeatMs = 40,
      graceMs = 300)
    // well past the grace in wall time: without the heartbeat this
    // lease would read stale; with it the second acquirer still loses
    Thread.sleep(600)
    intercept[IllegalStateException] {
      graft.io.Lease.acquire(path, heartbeatMs = 40, graceMs = 300)
    }
    // simulate kill -9: heartbeat stops, file stays (no release)
    l1.release() // spec cleanup can't leave a daemon beating...
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "dead-owner pid=0".getBytes) // ...so re-create a corpse by hand
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(path),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    val l2 = graft.io.Lease.acquire(path, heartbeatMs = 40,
      graceMs = 300) // stale: takeover succeeds
    l2.release()
  }

  test("release is ownership-checked: a lease that lost its file to a " +
      "takeover does not unseat the new owner") {
    val path = fresh()
    val l1 = graft.io.Lease.acquire(path, heartbeatMs = 50,
      graceMs = 60000)
    // a takeover replaced the file (simulated — the real path needs a
    // stalled heartbeat past the grace)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "new-owner pid=1".getBytes)
    l1.release()
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))) shouldBe "new-owner pid=1"
  }
}
