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
}
