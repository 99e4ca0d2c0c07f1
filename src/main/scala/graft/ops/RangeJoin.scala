package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-bucketed range join (SURVEY.md J7 range/theta family, the
  * scale path). Spark plans a raw `p.x >= i.lo && p.x < i.hi` join as a
  * broadcast-nested-loop — O(|points|·|intervals|) comparisons, fine for
  * an O(1) band table (q22), catastrophic when BOTH sides grow. The
  * standard fix: quantize the range dimension into fixed-width buckets,
  * join on bucket EQUALITY (hash/sort-merge — shuffles, partial-aggregates
  * and AQE-plans like any equi-join), and re-check the exact predicate as
  * a residual filter.
  *
  * Each interval replicates into ⌈len/width⌉ buckets, each point into
  * exactly one — pick `bucketWidth` near the median interval length so
  * replication stays O(1) per interval. A pathologically long interval
  * fans out proportionally (its matches do too); cap by splitting the
  * outliers into their own broadcast-side pass if that ever dominates.
  */
object RangeJoin {

  /** Join each point row to every interval row with
    * `lo <= point < hi`, as a bucket equi-join + residual filter.
    * Output: point columns followed by interval columns. */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
