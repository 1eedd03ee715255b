package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of `operators/Anomaly`: rolling z-score flags over a
  * live per-key metric stream, with the SAME exact-integer decision
  * rule ((n·x − s)² > z²·(n·q − s²) over the trailing-N baseline) so a
  * point is flagged in the stream iff the batch screen would flag it.
  *
  * Contract mirrors [[StreamingFunnel]]: events arrive IN ORDER per
  * key (keyed stream sources guarantee per-shard order); within a
  * microbatch the fold sorts by (ts, seq) so batch-boundary placement
  * never changes a verdict. State per key is the trailing window
  * ring — `window` longs plus the running position: 8·window bytes
  * per key, independent of stream length. Unlike the funnel's
  * set-once steps, replaying a delivery WOULD re-insert its value, so
  * the state carries the last folded (ts, seq) high-water mark and
  * drops not-newer events — at-least-once replays are filtered, not
  * double-counted.
  *
  * The sums are recomputed per event from the ring (window ≤ ~100 by
  * the same overflow guard as the batch operator) rather than
  * maintained incrementally — incremental ±x drift cannot happen, and
  * the per-event cost is the window scan the batch window function
  * pays anyway.
  */
object StreamingAnomaly {

  final case class Point(key: Long, ts: Long, seq: Long, value: Long)

  /** Per-point verdict, emitted for every NEW (non-replayed) point. */
  final case class Verdict(key: Long, ts: Long, seq: Long, value: Long,
                           nBase: Int, flagged: Boolean)

  /** Internal per-key state: trailing-value ring + replay high-water
    * mark. Public only because the state encoder's generated code
    * needs accessible accessors.
    */
  final case class RingState(ring: Seq[Long], lastTs: Long, lastSeq: Long)

  def flags(points: Dataset[Point], window: Int, minPoints: Int, z: Int,
            maxAbsValue: Long): Dataset[Verdict] = {
    require(window >= 2 && minPoints >= 2 && minPoints <= window,
      "need 2 <= minPoints <= window")
    require(z >= 1, "z must be >= 1")
    require(maxAbsValue > 0 &&
      BigInt(z) * BigInt(z) * BigInt(4) *
        (BigInt(window) * BigInt(maxAbsValue)).pow(2) < BigInt(Long.MaxValue),
      s"z=$z, window=$window, maxAbsValue=$maxAbsValue can overflow 64-bit " +
        "cross-multiplication — pre-scale the value column down")
    implicit val stateEnc: Encoder[RingState] = Encoders.product[RingState]
    implicit val outEnc: Encoder[Verdict] = Encoders.product[Verdict]
    points.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[RingState, Verdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case (key, evs, state: GroupState[RingState]) =>
          val st = state.getOption.getOrElse(RingState(Nil, Long.MinValue, Long.MinValue))
          var ring = st.ring.toVector
          var (lastTs, lastSeq) = (st.lastTs, st.lastSeq)
          val out = Vector.newBuilder[Verdict]
          for (e <- evs.toSeq.sortBy(e => (e.ts, e.seq))) {
            val isNew = e.ts > lastTs || (e.ts == lastTs && e.seq > lastSeq)
            if (isNew) {
              lastTs = e.ts; lastSeq = e.seq
              val n = ring.size.toLong
              val s = ring.sum
              val q = ring.map(v => v * v).sum
              val lhs = (n * e.value - s) * (n * e.value - s)
              val rhs = z.toLong * z * (n * q - s * s)
              out += Verdict(key, e.ts, e.seq, e.value, ring.size,
                ring.size >= minPoints && lhs > rhs)
              ring = (ring :+ e.value).takeRight(window)
            }
          }
          state.update(RingState(ring, lastTs, lastSeq))
          out.result().iterator
      }
  }
}
