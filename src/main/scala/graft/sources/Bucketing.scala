package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (100 TB posture): two fact tables bucketed and
  * sorted on their join key co-locate, so repeated joins skip the shuffle
  * AND the sort — the difference between an hourly pipeline re-shuffling
  * 100 TB and reading pre-organized buckets. Bucketing lives in the
  * catalog (`saveAsTable`), not bare parquet paths.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count —
    * plans as a shuffle-free (and with sortBy, sort-free) sort-merge join. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
