package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped closed-form linear regression (per-group trend fit): OLS
  * slope/intercept of y over x for every group in ONE aggregation pass —
  * the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) partial-aggregate
  * map-side, so a million-group fit over 100 TB costs exactly one
  * fixed-width shuffle; nothing iterative, nothing collected.
  *
  * Determinism contract (the engine's cross-engine float rule): x and y
  * arrive as ALREADY-QUANTIZED LONGS (epoch days, cents, micro-units) so
  * every sufficient statistic is an exact integer; the only floating
  * operations are the final slope/intercept divisions of two exact longs,
  * which are correctly rounded identically on every engine. The caller
  * CENTERS x near its mean (e.g. days since a mid-range date): the
  * statistics stay exact while |n·Σxy| < 2^63 — with centered x that
  * bound holds far past 10^9 rows per group; beyond it, rescale units.
  */
object Regression {

  /** @param groupCols grouping key columns
    * @param x quantized-long regressor column
    * @param y quantized-long response column
    * @return per group: n, slope = cov/var as double, intercept =
    *         (Σy − slope·Σx)/n as double; slope/intercept null when the
    *         group has a single distinct x (zero variance). */
  def trendFit(df: DataFrame, groupCols: Seq[String], x: Column, y: Column)
      : DataFrame = {
    val stats = df
      .select(groupCols.map(col) :+ x.cast("long").as("__x")
        :+ y.cast("long").as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val num = col("n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("n") * col("__sxx") - col("__sx") * col("__sx")
    stats
      .withColumn("slope",
        when(den =!= 0L, num.cast("double") / den.cast("double")))
      .withColumn("intercept",
        when(den =!= 0L,
          (col("__sy").cast("double") - col("slope") * col("__sx").cast("double"))
            / col("n").cast("double")))
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }
}
