package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build/probe over Spark's native sketch
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` —
  * the same machinery Catalyst's runtime row-level filtering injects,
  * exposed here as library Columns via the sql-package bridge).
  *
  * Items are hashed to 64-bit with `xxhash64` on BOTH the build and the
  * probe side (same seed by construction), so any orderable item type
  * works and the aggregate stores fixed-width longs. The built filter
  * is a `binary` value: collect it (it is sketch-sized — `numBits`/8
  * bytes — not data-sized) and embed it as a literal in the probe
  * expression. Membership is approximate one-way: a `false` from
  * [[mightContain]] is definitive, a `true` has false-positive
  * probability set by the bits-per-item budget — callers that need
  * exactness re-verify the survivors against the real set (see
  * `Dedup.decontaminateBloom`).
  *
  * Why this beats a broadcast hash set at 100 TB: a billion reference
  * items as strings is a multi-GB broadcast; at ~10 bits/item the bloom
  * is ~1.2 GB for 1e9 items at 1% fpp, and probing is a codegen'd
  * bit-test — no per-row set lookup into a giant JVM hash table.
  */
object BloomSet {

  /** Aggregate Column building a Bloom filter (binary) over the items.
    * `numBits` follows the standard optimal-bits formula via
    * [[suggestNumBits]]; pass it explicitly to pin memory.
    */
  /** Session confs gating the aggregate's size arguments: Spark's
    * `BloomFilterAggregate.checkInputDataTypes` rejects requests above
    * them (defaults: 4e6 items, 67,108,864 bits = 8 MB). A 1e9-item
    * deployment must RAISE these on its session; [[bloomAgg]] checks
    * eagerly so the failure is an actionable message at build time, not
    * an AnalysisException naming an internal conf.
    */
  val MaxItemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
  val MaxBitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"

  def bloomAgg(item: Column, expectedItems: Long, numBits: Long): Column = {
    require(expectedItems > 0 && numBits > 0, "need positive sizes")
    val active = org.apache.spark.sql.SparkSession.active
    val maxItems = active.conf.get(MaxItemsConf, "4000000").toLong
    val maxBits = active.conf.get(MaxBitsConf, "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom of $expectedItems items / $numBits bits exceeds the session caps " +
        s"($MaxItemsConf=$maxItems, $MaxBitsConf=$maxBits) — raise both confs " +
        "on the session to build filters at this scale")
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(item)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** `true` if the item is possibly in the built filter, `false` if
    * definitely not. `bloom` must be a foldable binary Column (a
    * `lit(bytes)` of a [[bloomAgg]] result) or a scalar subquery
    * (`df.agg(bloomAgg(...)).scalar()`) — the two shapes
    * `BloomFilterMightContain` accepts; anything else is an
    * analysis-time error.
    */
  def mightContain(bloom: Column, item: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        GraftColumnBridge.expression(bloom),
        GraftColumnBridge.expression(xxhash64(item))))

  /** Optimal bit count for an expected item count at a target false-
    * positive rate: n·ln(fpp)/ln(2)² rounded up (the classic formula —
    * same one Spark's sketch library uses).
    */
  def suggestNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }
}
