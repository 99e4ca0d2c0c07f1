package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign each event a per-user session index by
  * inactivity gap — the batch counterpart of the streaming
  * `session_window` path (graft.streaming.EventStreams).
  *
  * Plan shape: ONE shuffle on the user key serves both windows (lag and
  * the running sum share the same partitioning and ordering, so Catalyst
  * plans a single Exchange + Sort and evaluates both frames in one
  * WindowExec pass). At 100 TB this is the minimal-movement formulation:
  * events move once, grouped by user — there is no per-session shuffle
  * and no iteration.
  *
  * Timestamps are compared at microsecond grain (`unix_micros`): the
  * parquet source stores nanoseconds, and µs is the cross-engine parity
  * grain (see Tables.events).
  */
object Sessionize {

  /** Adds `session_idx` (1-based per user): a new session starts when the
    * gap since the user's previous event exceeds `gapSeconds`. Ordering
    * ties on the timestamp break by `tieCol` so the assignment is
    * deterministic under distributed execution. */
  def byGap(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = (prev.isNull || (us - prev) > gapSeconds * 1000000L).cast("long")
    events
      .withColumn("session_idx", sum(isNew).over(run))
  }

  /** Per-session summary: (user, session_idx) → bounds and event count.
    * One extra aggregation on the already-user-partitioned plane. */
  def sessions(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame =
    byGap(events, gapSeconds, userCol, tsCol, tieCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
