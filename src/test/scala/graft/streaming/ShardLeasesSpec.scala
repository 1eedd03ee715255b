package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import ShardLeases._

class ShardLeasesSpec extends AnyFunSuite {

  private val shards = Seq("shard-0", "shard-1", "shard-2", "shard-3")

  /** Deterministic, manually-advanced clock. */
  private final class TestClock { var now = 0L; def tick(ms: Long): Unit = now += ms }

  private def coordinator(store: LeaseStore, id: String, clock: TestClock) =
    new LeaseCoordinator(store, id, shards, failoverMillis = 1000L, clock = () => clock.now)

  test("a lone worker takes every shard; a joiner steals one per cycle until balanced") {
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val w1 = coordinator(store, "w1", clock)
    assert(w1.takeLeases() == shards.toSet)
    assert(w1.owned == shards.toSet)

    val w2 = coordinator(store, "w2", clock)
    // cycle 1: nothing free, nothing expired (w1 renews) -> steal ONE
    w1.renewAll()
    val stolen1 = w2.takeLeases()
    assert(stolen1.size == 1)
    assert(w1.renewAll() == stolen1) // the victim learns via the lost CAS
    // cycle 2: w1 still over target (3 > 2) -> steal one more
    val stolen2 = w2.takeLeases()
    assert(stolen2.size == 1 && (stolen2 & stolen1).isEmpty)
    w1.renewAll()
    // converged at 2/2; further cycles steal nothing
    assert(w2.takeLeases().isEmpty)
    assert(w1.owned.size == 2 && w2.owned.size == 2)
    assert((w1.owned & w2.owned).isEmpty)
  }

  test("a dead worker's leases expire after the failover window and the survivor takes full coverage") {
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val w1 = coordinator(store, "w1", clock)
    val w2 = coordinator(store, "w2", clock)
    w1.takeLeases(); w2.takeLeases(); w1.renewAll()
    w2.takeLeases(); w1.renewAll(); w2.takeLeases()
    assert(w1.owned.size + w2.owned.size == 4)

    // w2 dies (stops renewing). w1 keeps renewing; observes w2's
    // counters stalled. Before the window closes: no takeover.
    w1.takeLeases() // records current counters at t=now
    clock.tick(500); w1.renewAll()
    assert(w1.takeLeases().isEmpty, "must not steal inside the failover window")
    clock.tick(600); w1.renewAll()
    // window closed: expired leases don't count w2 as live, so the
    // target rises to 4 and w1 recovers everything
    val recovered = w1.takeLeases()
    assert(recovered == w2.owned)
    assert(w1.owned == shards.toSet)
    // the dead worker's own renew discovers every lease is gone
    assert(w2.renewAll() == recovered)
    assert(w2.owned.isEmpty)
  }

  test("checkpoints survive a takeover: the new owner resumes from the old owner's position") {
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val w1 = coordinator(store, "w1", clock)
    w1.takeLeases()
    assert(w1.checkpoint("shard-2", "seq-000042"))
    // w1 dies; w2 observes, waits out the failover, takes everything
    val w2 = coordinator(store, "w2", clock)
    assert(w2.takeLeases().size <= 2) // only its fair share while w1 looks alive
    clock.tick(1100)
    w2.takeLeases()
    assert(w2.owned.contains("shard-2"))
    assert(w2.lastCheckpoint("shard-2").contains("seq-000042"))
    // the old owner's late checkpoint is refused, not silently lost
    assert(w1.renewAll().contains("shard-2"))
    intercept[IllegalArgumentException](w1.checkpoint("shard-2", "seq-000099"))
  }

  test("graceful release frees shards immediately, no failover wait") {
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val w1 = coordinator(store, "w1", clock)
    w1.takeLeases()
    w1.releaseAll()
    assert(w1.owned.isEmpty)
    val w2 = coordinator(store, "w2", clock)
    assert(w2.takeLeases() == shards.toSet) // free, not stolen/expired
  }

  test("in-memory CAS: concurrent claims of the same version admit exactly one winner") {
    val store = new InMemoryLeaseStore
    assert(store.claim("s", None, Lease("s", "seed", 0L, None)))
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map { i =>
      new Thread(() => {
        if (store.claim("s", Some(("seed", 0L)), Lease("s", s"w$i", 1L, None)))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1)
    assert(store.list().head.counter == 1L)
  }

  test("filesystem store: create-exclusive epochs arbitrate races; payload round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-leases").toString
    val store = new FsLeaseStore(dir)
    assert(store.claim("shard-0", None, Lease("shard-0", "w1", 0L, None)))
    assert(store.claim("shard-0", Some(("w1", 0L)),
      Lease("shard-0", "w1", 1L, Some("seq-7"))))
    // stale CAS (wrong counter) refused
    assert(!store.claim("shard-0", Some(("w1", 0L)), Lease("shard-0", "w2", 2L, None)))
    val l = store.list().head
    assert(l == Lease("shard-0", "w1", 1L, Some("seq-7")))
    // a fresh store over the same directory sees the same state
    // (lease table survives the process, like the DynamoDB table)
    val reopened = new FsLeaseStore(dir)
    assert(reopened.list() == store.list())
    // racing epoch claims: exactly one of 8 threads creates epoch_2
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        if (reopened.claim("shard-0", Some(("w1", 1L)),
            Lease("shard-0", s"w$i", 2L, None)))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1)
  }

  test("full protocol runs over the filesystem store too") {
    val dir = java.nio.file.Files.createTempDirectory("graft-leases-proto").toString
    val store = new FsLeaseStore(dir)
    val clock = new TestClock
    val w1 = coordinator(store, "w1", clock)
    val w2 = coordinator(store, "w2", clock)
    w1.takeLeases(); w1.renewAll()
    w2.takeLeases(); w1.renewAll(); w2.takeLeases()
    w1.renewAll() // w1 discovers the second steal via the lost CAS
    assert(w1.owned.size == 2 && w2.owned.size == 2)
    assert((w1.owned | w2.owned) == shards.toSet)
  }
}
