package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view refresh): keep a
  * per-key aggregate current by merging the aggregate STATE of a new delta
  * batch, never reprocessing history.
  *
  * Works for any algebraic aggregate — one whose state merges by a
  * commutative/associative op. Here the state is (count, sum) per key,
  * which also answers avg; min/max merge the same way (but don't support
  * retraction). Sums are DECIMAL for cross-engine/order independence.
  *
  * Scale shape: refresh cost is O(delta) + one shuffle on the key over
  * |state ∪ delta-state| rows — at 100 TB the history table is never
  * read again; this is exactly Structured Streaming's update-mode
  * aggregation state, materialized as a batch table.
  */
object Incremental {

  /** Aggregate a batch to its mergeable state: one row per key with
    * (n_rows, sum per value column). */
  def aggState(batch: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      values.map(v => sum(col(v).cast("decimal(38,2)")).as(s"sum_$v"))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge aggregate states (previous materialization + delta state →
    * refreshed materialization). Union + re-sum: keys present in either
    * side survive, counts and sums add. */
  def merge(state: DataFrame, deltaState: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = state.columns.filterNot(keys.contains)
    require(valueCols.sameElements(deltaState.columns.filterNot(keys.contains)),
      "states must share the same value columns")
    val aggs = valueCols.toSeq.map(c => sum(col(c)).as(c))
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
