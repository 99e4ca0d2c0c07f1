package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal table maintenance: SCD Type 2 history build and CDC changelog
  * compaction — the two write-side operators a dimension/lakehouse pipeline
  * runs on every load.
  *
  * The reference keeps no history (each extraction overwrites the last —
  * redcap-etl.py re-extracts the full project per run); these operators are
  * the standard warehouse treatments of exactly that feed: turn a stream of
  * full-row observations into effective-dated history (SCD2), or compact an
  * insert/update/delete changelog into the current snapshot (CDC apply).
  *
  * Scale shape: both are ONE shuffle on the entity key followed by a single
  * sorted window pass — no joins, no iteration. State per key during the
  * window pass is O(1) (lag/lead/row_number), so skewed entities cost memory
  * nothing and AQE's skew handling applies to the exchange. At 100 TB the
  * cost is the key exchange, which carries only the projected change
  * columns.
  */
object Temporal {

  /** SCD Type 2 history from a change feed.
    *
    * `changes` has one row per observation of an entity; consecutive
    * observations with an unchanged `tracked` value are no-ops and collapse
    * into the open interval (the standard "only emit a new version when
    * something changed" SCD2 contract). Emits one row per version with
    * `valid_from`, `valid_to` (null = open / current), `is_current`, and a
    * per-entity `version` counter.
    *
    * Ordering within an entity is (`ts`, `tieBreak`) — the tie-break makes
    * the history deterministic when two observations share a timestamp.
    */
  def scd2(changes: DataFrame, key: Column, ts: Column, tieBreak: Column,
      tracked: Column): DataFrame = {
    val byTime = Window.partitionBy(key).orderBy(ts, tieBreak)
    val changed = changes
      .withColumn("__first", lag(ts, 1).over(byTime).isNull)
      .withColumn("__prev", lag(tracked, 1).over(byTime))
      // first observation, or value differs from the previous one
      // (null-safe: a tracked value may legitimately be null)
      .filter(col("__first") || !(tracked <=> col("__prev")))
      .drop("__first", "__prev")
    changed
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(byTime))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(byTime))
  }

  /** CDC apply: compact an insert/update/delete changelog to the current
    * snapshot. Latest change per key wins (ordered by `ts`, `tieBreak`);
    * keys whose latest operation is `deleteOp` disappear.
    */
  def cdcCompact(changelog: DataFrame, key: Column, ts: Column,
      tieBreak: Column, op: Column, deleteOp: String): DataFrame = {
    val latestFirst = Window.partitionBy(key).orderBy(ts.desc, tieBreak.desc)
    changelog
      .withColumn("__rn", row_number().over(latestFirst))
      .filter(col("__rn") === 1 && op =!= deleteOp)
      .drop("__rn")
  }
}
