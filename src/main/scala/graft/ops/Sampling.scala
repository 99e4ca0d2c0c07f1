package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic key-hash sampling (north-star training-data op).
  *
  * `rand()`-based sampling is NOT reproducible under distributed
  * execution: a task retry, a repartition, or a different cluster size
  * re-rolls the dice, so reruns disagree and exactly-once sinks see rows
  * flip in and out. Keying the decision on a hash of row CONTENT makes it
  * a pure row function — stable across retries, partitionings, ingestion
  * order, and corpus growth — and composes with the content-keyed
  * train/val/test split ([[TextAnalysis.splitBucket]]): the same bucket
  * space means a sampled subset never straddles split boundaries
  * inconsistently between runs.
  *
  * Scale: one codegen'd expression per row, no shuffle, pushes through
  * any downstream plan like an ordinary filter.
  */
object Sampling {

  /** Deterministic bucket ∈ [0, 100) from the 2^53 rolling fingerprint of
    * the key rendered as a string (cross-engine-reproducible, same hash
    * family as [[TextAnalysis.splitBucket]]). */
  def bucket(key: Column): Column =
    graft.functions.RollingFingerprint(key.cast("string")) % 100

  /** Keep ~`pct`% of rows, decided by [[bucket]] of `key`. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(bucket(key) < pct)

  /** Per-stratum sampling rates (percent), e.g. downsample dominant event
    * classes while keeping rare ones whole. Unlisted strata fall back to
    * `defaultPct`. The rate lookup is a codegen'd CASE cascade — the
    * strata map is driver-side configuration, never a join. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(strata === lit(s), lit(p)).otherwise(acc)
    }
    df.filter(bucket(key) < rate)
  }
}
