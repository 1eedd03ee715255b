package graft.savepoints

import org.apache.spark.util.AccumulatorV2

/** Progress-tracking accumulators (reference:
  * alternator/IntSetAccumulator.scala:12-36,
  * alternator/StringSetAccumulator.scala:16-38,
  * scylla/CqlTokenRangeAccumulator.scala:14-39).
  *
  * AccumulatorV2 is the idiomatic Spark tool here — a `collect_set`
  * aggregation would add a shuffle per savepoint, while accumulator
  * merges ride the existing task-completion path. The invariant that
  * makes task retries safe (SURVEY.md §7 hard part #6): skip-sets only
  * grow, and writes are idempotent, so overcounting on retried tasks is
  * harmless.
  */
final class StringSetAccumulator extends AccumulatorV2[String, Set[String]] {
  private val set = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  override def isZero: Boolean = set.isEmpty
  override def copy(): StringSetAccumulator = {
    val c = new StringSetAccumulator
    c.set.addAll(set); c
  }
  override def reset(): Unit = set.clear()
  override def add(v: String): Unit = set.add(v)
  override def merge(other: AccumulatorV2[String, Set[String]]): Unit =
    other.value.foreach(set.add)
  override def value: Set[String] = {
    val b = Set.newBuilder[String]
    set.forEach(s => b += s)
    b.result()
  }
}

final class IntSetAccumulator extends AccumulatorV2[Int, Set[Int]] {
  private val set = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  override def isZero: Boolean = set.isEmpty
  override def copy(): IntSetAccumulator = {
    val c = new IntSetAccumulator
    c.set.addAll(set); c
  }
  override def reset(): Unit = set.clear()
  override def add(v: Int): Unit = set.add(v)
  override def merge(other: AccumulatorV2[Int, Set[Int]]): Unit =
    other.value.foreach(set.add)
  override def value: Set[Int] = {
    val b = Set.newBuilder[Int]
    set.forEach(i => b += i)
    b.result()
  }
}

/** Token-range (start, end) set — the CQL savepoint unit. */
final class RangeSetAccumulator extends AccumulatorV2[(Long, Long), Set[(Long, Long)]] {
  private val set = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
  override def isZero: Boolean = set.isEmpty
  override def copy(): RangeSetAccumulator = {
    val c = new RangeSetAccumulator
    c.set.addAll(set); c
  }
  override def reset(): Unit = set.clear()
  override def add(v: (Long, Long)): Unit = set.add(v)
  override def merge(other: AccumulatorV2[(Long, Long), Set[(Long, Long)]]): Unit =
    other.value.foreach(set.add)
  override def value: Set[(Long, Long)] = {
    val b = Set.newBuilder[(Long, Long)]
    set.forEach(r => b += r)
    b.result()
  }
}
