package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.ShardLeases._

/** Lease-coordinated multi-reader CDC: two readers divide a sharded
  * changelog; killing one hands its shards to the survivor within the
  * failover window, resuming each from the dead reader's checkpoint —
  * no gaps, no dupes beyond at-least-once (and the idempotent merge
  * erases even those).
  */
class LeasedCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType.fromDDL("id LONG, v STRING, op STRING, seq LONG")
  private val shards = Seq("shard-0", "shard-1", "shard-2", "shard-3")

  private final class TestClock { var now = 0L; def tick(ms: Long): Unit = now += ms }

  /** One JSONL change file; keys are shard-disjoint (id = shard*1000+n). */
  private def writeFile(root: Path, shard: String, seq: Int,
                        records: Seq[(Long, String, String, Long)]): Unit = {
    val d = root.resolve(shard)
    Files.createDirectories(d)
    val body = records.map { case (id, v, op, sq) =>
      s"""{"id": $id, "v": "$v", "op": "$op", "seq": $sq}"""
    }.mkString("", "\n", "\n")
    Files.write(d.resolve(f"$seq%08d.jsonl"), body.getBytes(StandardCharsets.UTF_8))
  }

  private def reader(changes: Path, target: Path, store: LeaseStore,
                     id: String, clock: TestClock): LeasedCdc.Reader =
    new LeasedCdc.Reader(spark, changes.toString, schema, target.toString,
      Seq("id"), "op", b => Seq(b("seq").desc),
      new LeaseCoordinator(store, id, shards, failoverMillis = 1000L,
        clock = () => clock.now))

  private def state(target: Path): Map[Long, String] =
    LeasedCdc.snapshot(spark, target.toString)
      .map(_.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap)
      .getOrElse(Map.empty)

  test("two readers balance the shards; killing one fails over from its checkpoints") {
    val root = Files.createTempDirectory("graft-lcdc")
    val changes = root.resolve("changes")
    val target = root.resolve("state")
    shards.zipWithIndex.foreach { case (s, i) =>
      writeFile(changes, s, 1, (0 until 5).map(n =>
        (i * 1000L + n, s"w1-$n", "put", 1L)))
    }
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val a = reader(changes, target, store, "reader-a", clock)
    val b = reader(changes, target, store, "reader-b", clock)

    // A polls first and takes everything; B steals one per cycle until
    // the split is 2/2. Every wave-1 record lands exactly once overall.
    val aApplied = a.pollOnce()
    assert(a.coordinator.owned == shards.toSet)
    assert(aApplied.values.sum == 20L)
    clock.tick(100); b.pollOnce(); a.pollOnce()
    clock.tick(100); b.pollOnce(); a.pollOnce()
    assert(a.coordinator.owned.size == 2 && b.coordinator.owned.size == 2)
    assert(state(target) == (for (i <- 0 until 4; n <- 0 until 5)
      yield (i * 1000L + n) -> s"w1-$n").toMap)

    // wave 2 touches every shard: updates + a delete per shard
    shards.zipWithIndex.foreach { case (s, i) =>
      writeFile(changes, s, 2,
        Seq((i * 1000L + 0, s"w2-0", "put", 2L),
            (i * 1000L + 1, "", "delete", 2L),
            (i * 1000L + 5, s"w2-5", "put", 2L)))
    }
    // B dies (never polls again). A keeps its heartbeat; B's lease
    // counters stall. A's wave-2 progress on its OWN shards is immediate.
    val aOwnBefore = a.coordinator.owned
    val applied2 = a.pollOnce()
    assert(applied2.keySet == aOwnBefore && applied2.values.sum == 6L)

    // inside the failover window B's shards are untouched by A
    clock.tick(500)
    assert(a.pollOnce().isEmpty)
    assert(a.coordinator.owned == aOwnBefore)

    // past the window: A observes the stall, takes BOTH expired shards
    // in one cycle (dead workers don't count toward the fair target),
    // and applies exactly wave 2 from B's checkpoints — 3 records per
    // stolen shard, not 8 (a re-read from trim horizon would be 8).
    clock.tick(600)
    val applied3 = a.pollOnce()
    assert(a.coordinator.owned == shards.toSet)
    assert(applied3.keySet == shards.toSet -- aOwnBefore)
    assert(applied3.values.toSeq == Seq(3L, 3L))

    // final state: every shard reflects wave 2 exactly once — updates
    // applied, deletes gone, no wave-1 ghosts, no duplicates
    val expect = (for (i <- 0 until 4) yield {
      Seq((i * 1000L + 0) -> "w2-0", (i * 1000L + 5) -> "w2-5") ++
        (2 until 5).map(n => (i * 1000L + n) -> s"w1-$n")
    }).flatten.toMap
    assert(state(target) == expect)
    val snap = LeasedCdc.snapshot(spark, target.toString).get
    assert(snap.count() == snap.select("id").distinct().count())
  }

  test("graceful release hands shards over without waiting out the failover") {
    val root = Files.createTempDirectory("graft-lcdc2")
    val changes = root.resolve("changes")
    val target = root.resolve("state")
    shards.zipWithIndex.foreach { case (s, i) =>
      writeFile(changes, s, 1, Seq((i * 1000L, "x", "put", 1L)))
    }
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val a = reader(changes, target, store, "reader-a", clock)
    val b = reader(changes, target, store, "reader-b", clock)
    a.pollOnce()
    assert(a.coordinator.owned == shards.toSet)
    a.close()
    assert(a.coordinator.owned.isEmpty)
    // no clock advance needed: released leases are free immediately
    val applied = b.pollOnce()
    assert(b.coordinator.owned == shards.toSet)
    // and B resumed from A's checkpoints — nothing to re-apply
    assert(applied.isEmpty)
    assert(state(target) == (0 until 4).map(i => (i * 1000L) -> "x").toMap)
  }

  test("a corrupt record fails the poll loudly instead of dropping changes") {
    val root = Files.createTempDirectory("graft-lcdc3")
    val changes = root.resolve("changes")
    val d = changes.resolve("shard-0")
    Files.createDirectories(d)
    Files.write(d.resolve("00000001.jsonl"),
      "{\"id\": 1, \"v\": \"a\", \"op\": \"put\", \"seq\": 1}\nnot json\n"
        .getBytes(StandardCharsets.UTF_8))
    val store = new InMemoryLeaseStore
    val clock = new TestClock
    val r = new LeasedCdc.Reader(spark, changes.toString, schema,
      root.resolve("state").toString, Seq("id"), "op", b => Seq(b("seq").desc),
      new LeaseCoordinator(store, "reader-a", Seq("shard-0"),
        failoverMillis = 1000L, clock = () => clock.now))
    val e = intercept[Exception](r.pollOnce())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(m =>
      m.contains("Malformed") || m.contains("corrupt") || m.contains("FAILFAST"))))
    // the checkpoint did NOT advance — the file replays after the fix
    assert(r.coordinator.lastCheckpoint("shard-0").isEmpty)
  }
}
