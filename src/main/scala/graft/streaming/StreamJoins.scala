package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins (Structured Streaming).
  *
  * The reference's streaming surface is replicate-only (SURVEY.md §2.12:
  * no windows, no joins); these operators are the "beyond ref" streaming
  * tier: correlate two live streams with bounded state.
  *
  * State-bound mechanics — the part that matters at scale: an unbounded
  * stream-stream join must buffer EVERY past row of both sides forever.
  * A watermark on each side plus a two-sided event-time bound in the
  * join condition lets Spark expire buffered rows deterministically:
  * a right row can be dropped once the left watermark passes
  * `rightTs + lookback`, and vice versa. State size is then
  * O(rate × (delay + lookback)) per key-partition, independent of
  * stream age. Both inputs must use DISTINCT column names (the joined
  * schema keeps both sides).
  */
object StreamJoins {

  /** Inner interval join: left row l matches right rows r with the same
    * key and `l.ts - lookback <= r.ts <= l.ts` (the "purchase follows a
    * click within N minutes" shape; `lookback`/`delayThreshold` are SQL
    * interval strings like "10 minutes").
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   delayThreshold: String, lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, delayThreshold)
    val r = right.withWatermark(rightTs, delayThreshold)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
  }

  /** Left-outer interval join: same bounds, but a left row with no match
    * is emitted with nulls once the right watermark passes the end of
    * its interval (the point where a match is provably impossible —
    * outer results are late by construction, not buffered forever).
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            leftKey: String, rightKey: String,
                            leftTs: String, rightTs: String,
                            delayThreshold: String, lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, delayThreshold)
    val r = right.withWatermark(rightTs, delayThreshold)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      "left_outer")
  }
}
