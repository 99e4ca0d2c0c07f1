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

  /** Pairwise Pearson correlation for every unordered pair of `vars`, per
    * group, in ONE aggregation pass: k sums + k sums-of-squares +
    * k·(k−1)/2 cross sums partial-aggregate map-side into a single
    * fixed-width row per group; the pair expansion afterwards is a pure
    * in-row `explode` of an already-aggregated row (no second scan, no
    * join).
    *
    * Determinism contract: `vars` are quantized longs; every sufficient
    * statistic is an exact int64 (valid while n·max² < 2^63 — e.g.
    * values ≤ 10⁴ hold past 10¹⁰ rows per group; rescale units beyond).
    * The final correlation is computed in double with a FIXED operation
    * tree — num/(sqrt(varx)·sqrt(vary)) over exact-long inputs — so each
    * double op is correctly rounded from identical inputs on any engine.
    * Zero-variance pairs yield null. */
  def corrPairs(df: DataFrame, groupCols: Seq[String],
      vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2, "need at least two variables")
    val names = vars.map(_._1)
    val proj = df.select(groupCols.map(col) ++
      vars.map { case (n, c) => c.cast("long").as(s"__v_$n") }: _*)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val aggs = (count(lit(1)).as("n") +:
      names.flatMap { n =>
        Seq(sum(col(s"__v_$n")).as(s"__s_$n"),
          sum(col(s"__v_$n") * col(s"__v_$n")).as(s"__q_$n"))
      }) ++ pairs.map { case (a, b) =>
        sum(col(s"__v_$a") * col(s"__v_$b")).as(s"__p_${a}_$b")
      }
    val stats = proj.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val nd = col("n").cast("double")
    val pairStructs = pairs.map { case (a, b) =>
      val sx = col(s"__s_$a").cast("double")
      val sy = col(s"__s_$b").cast("double")
      val num = nd * col(s"__p_${a}_$b").cast("double") - sx * sy
      val vx = nd * col(s"__q_$a").cast("double") - sx * sx
      val vy = nd * col(s"__q_$b").cast("double") - sy * sy
      struct(lit(a).as("var_x"), lit(b).as("var_y"),
        when(vx > 0d && vy > 0d, num / (sqrt(vx) * sqrt(vy))).as("corr"))
    }
    stats
      .select(groupCols.map(col) ++ Seq(col("n"),
        explode(array(pairStructs: _*)).as("__pr")): _*)
      .select(groupCols.map(col) ++ Seq(col("n"), col("__pr.var_x"),
        col("__pr.var_y"), col("__pr.corr")): _*)
  }
}
