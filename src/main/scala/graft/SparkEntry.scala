package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[QueryDef]] in
  * one of the operator modules; this object is just the aggregation point.
  */
object SparkEntry {

  /** All registered query definitions, in module order. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      EtlQueries.defs ++ LlmQueries.defs ++ CorpusQueries.defs ++
      MixtureQueries.defs ++ CurationQueries.defs ++ EntityQueries.defs ++
      StatsQueries.defs ++ EvalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full ETL shape in one plan: EAV synthesis → PHI rule cascade →
    * broadcast-dim join aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")
      .unionByName(
        queries("q32_phi_filter")(spark, "/root/testdata/sf0.001")
          .groupBy("field_name")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).cast("double").as("revenue"))
          .withColumnRenamed("field_name", "r_name")
          .withColumn("n_name", org.apache.spark.sql.functions.lit("etl"))
          .withColumn("n_orders", org.apache.spark.sql.functions.lit(0L))
          .select("r_name", "n_name", "revenue", "n_orders"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
