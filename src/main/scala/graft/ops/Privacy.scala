package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over de-identified extracts — the release gate
  * that belongs next to the PHI rule cascade (the reference's
  * de-identification concern, /root/reference/dcc_transforms.py, decides
  * what leaves; these measure how re-identifiable what leaves still is).
  *
  * Scale: pure fixed-width aggregations over the quasi-identifier key —
  * one exchange, map-side partial, no row-level data retained beyond the
  * group frame.
  */
object Privacy {

  /** k-anonymity / l-diversity audit: group rows by their quasi-
    * identifier combination; a group smaller than `k` is re-identifiable
    * (k-anonymity violation), and a group whose sensitive attribute
    * takes fewer than `l` distinct values is attribute-disclosing even
    * when large (l-diversity violation, Machanavajjhala et al. 2007).
    *
    * @param quasiCols the quasi-identifier columns (the attacker's
    *                  linkage keys: region, segment, coarse dates…)
    * @param sensitive the sensitive attribute whose diversity matters
    * @return one row per equivalence class: quasi cols, n (class size),
    *         l_div (distinct sensitive values), at_risk (n < k),
    *         low_diversity (l_div < l) */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
      k: Int, l: Int = 2): DataFrame =
    df.select(quasiCols.map(col) :+ sensitive.as("__sens"): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("__sens")).as("l_div"))
      .withColumn("at_risk", col("n") < k.toLong)
      .withColumn("low_diversity", col("l_div") < l.toLong)

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) for an ORDERED
    * sensitive attribute: per equivalence class, the earth-mover's
    * distance between the class's sensitive distribution and the global
    * one — the disclosure [[kAnonymity]]'s l-diversity misses (a class
    * can hold l distinct salaries that are all in the top decile). For
    * ordered buckets EMD has the closed form
    * (1/(m−1))·Σᵢ |Σ_{j≤i} (p_j − q_j)| over the m-bucket axis.
    *
    * EXACTNESS: fractions never materialize — the cumulative term is
    * kept as the integer numerator Σ_{j≤i}(cnt_cj·N − cnt_gj·n_c) in
    * DECIMAL(38,0) (exact to 10³⁸, far past any real table), and the
    * final distance is one integral division:
    * t_x6 = ⌊1e6·Σ|cum| / (n_c·N·(m−1))⌋ — bit-identical cross-engine.
    *
    * Scale shape: one (class, bucket) count aggregate; the bucket axis
    * is BOUNDED by contract (quantize upstream — the calibrationBins
    * discipline) so the per-class cumulative window runs over ≤ m rows
    * per class, and the m-row global frame broadcasts.
    *
    * @param sensitiveBucket integral ordered bucket of the sensitive
    *                        attribute (quantize floats upstream)
    * @return one row per class: quasi cols, n (class size), t_x6
    *         (quantized EMD; 0 = identical to global, 1e6 = maximal);
    *         single-bucket axes (m = 1) return t_x6 = 0 */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveBucket: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base0 = df
      .select(quasiCols.map(col) :+ sensitiveBucket.cast("long").as("__b"): _*)
      .withColumn("__b", when(col("__b").isNotNull, col("__b"))
        .otherwise(raise_error(lit(
          "tCloseness: sensitive bucket must be non-null integral"))))
    // NULL quasi values would form a groupBy class that the non-null-safe
    // grid join can never match back to its own counts (c = 0 in every
    // bucket → a silently near-maximal t); fail loudly like __b instead
    val base = quasiCols.foldLeft(base0) { (b, q) =>
      b.withColumn(q, when(col(q).isNotNull, col(q)).otherwise(
        raise_error(lit(s"tCloseness: NULL quasi value in '$q' — " +
          "coalesce a sentinel upstream"))))
    }
    val cb = base.groupBy(quasiCols.map(col) :+ col("__b"): _*)
      .agg(count(lit(1)).as("cnt")).localCheckpoint()
    val gb = cb.groupBy(col("__b")).agg(sum(col("cnt")).as("g"))
    val m = gb.count()
    val nTot = base.count()
    val classes = cb.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("cnt")).as("n"))
    // full (class × bucket) grid: zero-count buckets still move mass
    val grid = classes.crossJoin(broadcast(gb))
      .join(cb, quasiCols :+ "__b", "left")
      .select(quasiCols.map(col) :+ col("n") :+ col("__b") :+ col("g")
        :+ coalesce(col("cnt"), lit(0L)).as("c"): _*)
    if (m <= 1)
      return classes.select(quasiCols.map(col) :+ col("n")
        :+ lit(0L).as("t_x6"): _*)
    val wOrd = Window.partitionBy(quasiCols.map(col): _*).orderBy(col("__b"))
    grid
      .withColumn("__d",
        col("c").cast("decimal(38,0)") * lit(nTot) -
          col("g").cast("decimal(38,0)") * col("n"))
      .withColumn("__cum", sum(col("__d")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(quasiCols.map(col) :+ col("n"): _*)
      .agg(sum(abs(col("__cum"))).as("__s"))
      .select(quasiCols.map(col) :+ col("n")
        :+ expr(s"(CAST(1000000 AS DECIMAL(38,0)) * __s) div " +
          s"(CAST(n AS DECIMAL(38,0)) * ${nTot}L * ${m - 1}L)").as("t_x6"): _*)
  }
}
