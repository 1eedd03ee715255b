package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked session-window aggregation — the streaming twin of the
  * batch gap-rule sessionizer (operators/Sessionize): events of a key
  * within `gap` of each other merge into one session; sessions finalize
  * (append-mode emit, state evicted) once the watermark passes their
  * end. `session_window` is the engine-native form: state is per
  * in-flight session in the state store, merged incrementally as
  * batches arrive — no per-key event buffering, no custom state class,
  * and the watermark bounds state size by construction (a key that
  * goes quiet costs nothing after gap + watermark).
  *
  * Identical semantics in batch mode (one global pass, no watermark
  * needed) — SessionWindowsSpec pins streaming-vs-batch agreement and
  * the gap-merge/split rule against operators/Sessionize.
  */
object SessionWindows {

  /** (key, session_start, session_end, n_events) per session. The
    * session end is lastEvent + gap — the engine's convention; the
    * batch Sessionize reports lastEvent, so comparisons subtract gap.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gap: String, watermark: String): DataFrame = {
    val base =
      if (events.isStreaming) events.withWatermark(tsCol, watermark)
      else events
    base
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }
}
