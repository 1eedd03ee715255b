package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Shard-lease coordination — the portable re-expression of the lease
  * semantics the reference gets from the Kinesis Client Library
  * (reference: spark-kinesis-dynamodb/.../KinesisDynamoDBReceiver.scala
  * builds a KCL Worker with `withFailoverTimeMillis(60000)` and a
  * DynamoDB lease table named by `checkpointAppName`; the KCL protocol
  * itself is public: a lease row per shard carrying (owner, counter,
  * checkpoint), renewed by conditional counter increment, stealable
  * once the counter stops moving for a failover period, balanced by
  * stealing at most one lease per taker cycle from the largest owner).
  *
  * What this gives the engine offline: N cooperating readers of a
  * sharded changelog (ChangeLogSource directories, DynamoDB S3-export
  * segments, Kinesis shards when wired to a live endpoint) divide the
  * shards among themselves, survive a reader's death within the
  * failover window, and resume each shard from its last checkpoint —
  * without a coordination service beyond a store that can do a
  * conditional write.
  *
  * Concurrency model: every mutation is a compare-and-swap on the
  * lease's (owner, counter) version — exactly DynamoDB's conditional
  * put. A renewal that loses the CAS means the lease was stolen; the
  * loser drops the shard. Expiry is observed locally (KCL-style): a
  * taker remembers each lease's counter and steals only after the
  * counter has provably not moved for `failoverMillis` of its OWN
  * observation — wall-clock skew between workers cannot cause a
  * premature steal, only a late one.
  */
object ShardLeases {

  /** One shard's lease row. `counter` is the CAS version: any mutation
    * must name the exact (owner, counter) it read.
    */
  final case class Lease(shardId: String, owner: String, counter: Long,
                         checkpoint: Option[String])

  /** Conditional-write lease store — the DynamoDB-lease-table contract
    * reduced to the two operations the protocol needs.
    */
  trait LeaseStore {
    def list(): Seq[Lease]

    /** Compare-and-swap: install `next` iff the shard's current
      * (owner, counter) equals `expected` (None = the shard has no
      * lease row yet). Returns false on any mismatch — the caller
      * lost a race and must re-read.
      */
    def claim(shardId: String, expected: Option[(String, Long)], next: Lease): Boolean
  }

  /** Heap-backed store for single-process fleets (and the spec's
    * many-threads contention harness).
    */
  final class InMemoryLeaseStore extends LeaseStore {
    private val rows = new java.util.concurrent.ConcurrentHashMap[String, Lease]()

    def list(): Seq[Lease] = rows.values.asScala.toSeq.sortBy(_.shardId)

    def claim(shardId: String, expected: Option[(String, Long)], next: Lease): Boolean =
      expected match {
        case None => rows.putIfAbsent(shardId, next) == null
        case Some((owner, counter)) =>
          val cur = rows.get(shardId)
          cur != null && cur.owner == owner && cur.counter == counter &&
            rows.replace(shardId, cur, next)
      }
  }

  /** Filesystem-backed store: the CAS is an atomic create-exclusive of
    * the next epoch file `<shard>/epoch_<counter>` — exactly one
    * contender can create it, so exactly one claim per counter wins
    * (the local-FS analog of DynamoDB's conditional put; savepoint-
    * style tmp+rename carries the payload). Epochs are monotonic and
    * never reused; stale epoch files are pruned opportunistically.
    */
  final class FsLeaseStore(dir: String) extends LeaseStore {
    private val root = Paths.get(dir)
    Files.createDirectories(root)

    private def shardDir(shardId: String): Path = root.resolve(shardId)

    private def read(p: Path): Option[Lease] = {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).split("\n", -1)
      // payload: owner \n checkpoint ("" = none)
      val counter = p.getFileName.toString.stripPrefix("epoch_").toLong
      Some(Lease(p.getParent.getFileName.toString, parts(0), counter,
        Some(parts(1)).filter(_.nonEmpty)))
    }

    private def latestEpoch(shardId: String): Option[Path] = {
      val d = shardDir(shardId)
      if (!Files.isDirectory(d)) None
      else Files.list(d).iterator.asScala.toSeq
        .filter(_.getFileName.toString.startsWith("epoch_"))
        // zero-padded names: lexicographic max = numeric max
        .sortBy(_.getFileName.toString).lastOption
    }

    def list(): Seq[Lease] = {
      if (!Files.isDirectory(root)) return Nil
      Files.list(root).iterator.asScala.toSeq
        .filter(Files.isDirectory(_)).sortBy(_.getFileName.toString)
        .flatMap(d => latestEpoch(d.getFileName.toString).flatMap(read))
    }

    def claim(shardId: String, expected: Option[(String, Long)], next: Lease): Boolean = {
      val current = latestEpoch(shardId).flatMap(read)
      val matches = (expected, current) match {
        case (None, None) => true
        case (Some((o, c)), Some(cur)) => cur.owner == o && cur.counter == c
        case _ => false
      }
      if (!matches) return false
      if (current.exists(_.counter >= next.counter)) return false
      val d = shardDir(shardId)
      Files.createDirectories(d)
      val target = d.resolve(f"epoch_${next.counter}%019d")
      try {
        // create-exclusive IS the race arbiter: second contender throws
        Files.write(target,
          (next.owner + "\n" + next.checkpoint.getOrElse(""))
            .getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW)
        // opportunistic prune of superseded epochs (best-effort; readers
        // only ever consult the latest)
        Files.list(d).iterator.asScala.toSeq
          .filter(p => p.getFileName.toString.startsWith("epoch_") && p != target)
          .sortBy(_.getFileName.toString).dropRight(2)
          .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    }
  }

  /** One worker's view of the fleet: call [[renewAll]] on a heartbeat
    * cadence well inside `failoverMillis`, and [[takeLeases]] on the
    * taker cadence (KCL runs the taker at ~2x failover). `clock` is
    * injectable so specs can advance time deterministically.
    */
  final class LeaseCoordinator(store: LeaseStore, val workerId: String,
                               shardIds: Seq[String], failoverMillis: Long,
                               clock: () => Long = () => System.currentTimeMillis()) {
    require(workerId.nonEmpty && shardIds.nonEmpty)

    /** shard -> (last counter seen, when that counter was FIRST seen) */
    private val observed = scala.collection.mutable.Map.empty[String, (Long, Long)]
    private val ownedSet = scala.collection.mutable.Set.empty[String]

    def owned: Set[String] = ownedSet.toSet

    /** Renew every held lease by CAS counter increment. A lost CAS
      * means the lease was stolen — the shard is dropped immediately
      * (processing it further would double-read against the thief).
      * Returns the shards dropped this cycle.
      */
    def renewAll(): Set[String] = {
      val current = store.list().map(l => l.shardId -> l).toMap
      val lost = ownedSet.toSeq.filter { s =>
        current.get(s) match {
          case Some(l) if l.owner == workerId =>
            !store.claim(s, Some((l.owner, l.counter)), l.copy(counter = l.counter + 1))
          case _ => true
        }
      }
      ownedSet --= lost
      lost.toSet
    }

    /** Record the shard's restart position. CAS like any mutation: if
      * the lease moved since we read it (stolen mid-checkpoint), the
      * write is refused and the shard is dropped.
      */
    def checkpoint(shardId: String, position: String): Boolean = {
      require(ownedSet.contains(shardId), s"not holding $shardId")
      val ok = store.list().find(_.shardId == shardId) match {
        case Some(l) if l.owner == workerId =>
          store.claim(shardId, Some((l.owner, l.counter)),
            l.copy(counter = l.counter + 1, checkpoint = Some(position)))
        case _ => false
      }
      if (!ok) { ownedSet -= shardId; () }
      ok
    }

    /** The restart position recorded by ANY previous owner. */
    def lastCheckpoint(shardId: String): Option[String] =
      store.list().find(_.shardId == shardId).flatMap(_.checkpoint)

    /** Graceful handback: zero the owner so other takers treat the
      * shard as free immediately instead of waiting out the failover.
      */
    def releaseAll(): Unit = {
      store.list().filter(l => ownedSet.contains(l.shardId) && l.owner == workerId)
        .foreach(l => store.claim(l.shardId,
          Some((l.owner, l.counter)), l.copy(owner = "", counter = l.counter + 1)))
      ownedSet.clear()
    }

    /** One taker cycle (the KCL LeaseTaker recipe):
      *
      *  1. unleased or explicitly released shards are free — take them
      *     up to the fair target ceil(shards / workers)
      *  2. a lease whose counter has not moved for `failoverMillis` of
      *     THIS coordinator's own observation is expired — take it
      *  3. still below target and nothing free: steal ONE lease from
      *     the current largest holder (one per cycle bounds churn —
      *     two workers joining simultaneously converge instead of
      *     thrashing the same victim)
      *
      * Returns the shards newly acquired this cycle.
      */
    def takeLeases(): Set[String] = {
      val now = clock()
      val leases = store.list().map(l => l.shardId -> l).toMap
      // refresh expiry observations
      shardIds.foreach { s =>
        leases.get(s).foreach { l =>
          observed.get(s) match {
            case Some((c, _)) if c == l.counter => () // still stalled
            case _ => observed(s) = (l.counter, now)
          }
        }
      }
      // a lease is expired once its counter has provably stalled for a
      // full failover window of OUR observation
      val expired: Set[String] = shardIds.filter { s =>
        leases.get(s).exists(l => l.owner.nonEmpty && l.owner != workerId &&
          observed.get(s).exists { case (c, since) =>
            c == l.counter && now - since >= failoverMillis })
      }.toSet
      // the fair-share target counts only LIVE workers: a dead worker's
      // expired leases must not depress the target, or the survivors
      // would stop below full coverage (KCL excludes expired lease
      // owners from the worker count the same way)
      val holders = leases.values
        .filter(l => l.owner.nonEmpty && !expired(l.shardId))
        .groupBy(_.owner).view.mapValues(_.size).toMap
      val workers = (holders.keySet + workerId).size
      val target = (shardIds.size + workers - 1) / workers
      var acquired = Set.empty[String]
      def below = ownedSet.size < target

      def tryTake(l: Option[Lease], shardId: String): Unit = {
        val ok = l match {
          case None =>
            store.claim(shardId, None, Lease(shardId, workerId, 0L, None))
          case Some(cur) =>
            store.claim(shardId, Some((cur.owner, cur.counter)),
              cur.copy(owner = workerId, counter = cur.counter + 1))
        }
        if (ok) { ownedSet += shardId; acquired += shardId }
      }

      // 1: free shards (no row, or gracefully released)
      for (s <- shardIds if below && !ownedSet.contains(s)) {
        leases.get(s) match {
          case None => tryTake(None, s)
          case Some(l) if l.owner.isEmpty => tryTake(Some(l), s)
          case _ => ()
        }
      }
      // 2: expired shards (counter provably stalled for a full failover)
      for (s <- shardIds if below && !ownedSet.contains(s) && expired(s))
        leases.get(s).foreach(l => tryTake(Some(l), s))
      // 3: steal one from the largest live holder
      if (below) {
        val victims = leases.values
          .filter(l => l.owner.nonEmpty && l.owner != workerId && !expired(l.shardId))
          .groupBy(_.owner).toSeq
          .sortBy { case (o, ls) => (-ls.size, o) }
        victims.headOption.collect {
          case (_, ls) if ls.size > target ||
              (ls.size == target && ownedSet.size < target - 1) =>
            ls.toSeq.sortBy(_.shardId).head
        }.foreach(l => tryTake(Some(l), l.shardId))
      }
      acquired
    }
  }
}
