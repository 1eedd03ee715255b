package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of `operators/Funnel`: per-key ordered-step
  * conversion tracking with O(steps) state per key — no event buffering.
  *
  * Contract: events arrive IN ORDER per key (the per-shard ordering a
  * keyed stream source — Kinesis/DynamoDB Streams — already guarantees;
  * the batch twin has no such requirement because it sees everything).
  * Under in-order delivery the first qualifying event IS the minimum,
  * so the O(k) state is exact: `StreamingFunnelSpec` asserts parity
  * with `Funnel.reachTimes` across microbatch cuts. Replayed
  * (at-least-once) deliveries are naturally idempotent — a step only
  * ever sets once. Within one microbatch events are sorted by (ts,
  * seq) before folding, so batch-boundary placement never changes the
  * result.
  *
  * State is a fixed-width vector of reach instants (epoch micros) —
  * bytes per key = 8·steps + key, regardless of event volume.
  */
object StreamingFunnel {

  final case class FunnelEvent(key: Long, ts: Long, seq: Long, etype: String)

  /** Reach state/output: `reach(i)` is step i's reach instant (epoch
    * micros), None until reached; `stepsReached` counts the prefix.
    */
  final case class FunnelReach(key: Long, reach: Seq[Option[Long]], stepsReached: Int)

  /** Fold a key's new events into its reach vector. Emits the key's
    * current reach row every microbatch that touches it (update mode).
    * Works identically on a batch Dataset (state spans the batch).
    */
  def track(events: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelReach] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    implicit val stateEnc: Encoder[FunnelReach] = Encoders.product[FunnelReach]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .mapGroupsWithState[FunnelReach, FunnelReach](GroupStateTimeout.NoTimeout()) {
        case (key, evs, state: GroupState[FunnelReach]) =>
          var reach = state.getOption.map(_.reach.toArray)
            .getOrElse(Array.fill[Option[Long]](steps.size)(None))
          for (e <- evs.toSeq.sortBy(e => (e.ts, e.seq))) {
            val i = steps.indexOf(e.etype)
            if (i >= 0 && reach(i).isEmpty &&
                (i == 0 || reach(i - 1).exists(_ <= e.ts)))
              reach(i) = Some(e.ts)
          }
          val next = FunnelReach(key, reach.toSeq, reach.takeWhile(_.isDefined).size)
          state.update(next)
          next
      }
  }
}
