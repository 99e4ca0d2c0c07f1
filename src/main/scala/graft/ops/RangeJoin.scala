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

  /** Interval-overlap join (temporal join of two interval tables): all
    * (a, b) pairs sharing `keys` whose CLOSED intervals overlap
    * (`a.start <= b.end && b.start <= a.end`). Catalyst would plan the
    * raw theta condition as a per-key nested loop; bucketizing both sides
    * to `bucketWidth` tiles converts it to an equi-join on
    * (keys, bucket) — an interval joins every tile it touches, a pair
    * meets in at least one shared tile, and duplicates from multi-tile
    * overlaps are dropped ON THE PAIR IDS (`aId`/`bId`), so the exchange
    * stays an equi-shuffle and the residual filter is exact.
    *
    * Both sides' columns survive in the output (caller projects).
    * `bucketWidth` tunes tiles-per-interval (cost) against bucket
    * population (selectivity): ~the median interval length is right.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
      aId: String, bId: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def tiles(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(floor(col(lo) / bucketWidth),
          floor(col(hi) / bucketWidth))))
    tiles(a, aStart, aEnd)
      .join(tiles(b, bStart, bEnd), keys :+ "__bucket")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .drop("__bucket")
      .dropDuplicates(keys :+ aId :+ bId)
  }
}
