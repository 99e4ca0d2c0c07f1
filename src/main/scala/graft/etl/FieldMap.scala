package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Field-map control-plane table (SURVEY.md §1.2 item 2, J1).
  *
  * The reference loads the CSV into a driver-side dict for O(1) probes
  * (/root/reference/redcap-etl.py:294-297); the Spark-native equivalent is a
  * small DataFrame marked for broadcast at the join site — same build-side
  * hash table, built once per executor instead of once per process.
  */
object FieldMap {

  /** Read a field-map CSV; pandas' NaN→None normalization
    * (redcap-etl.py:296) is how Spark's csv reader already behaves
    * (empty cell → null). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Normalize an in-memory or loaded frame to the canonical column set;
    * missing control columns materialize as nulls so downstream expressions
    * never need existence checks. */
  def normalize(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = Model.fieldMapColumns.map { c =>
      if (present(c)) col(s"`$c`") else lit(null).cast("string").as(c)
    }
    df.select(cols: _*)
  }
}
