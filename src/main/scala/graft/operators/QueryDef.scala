package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exercise: a Spark query plus (where SQL can
  * express it) the equivalent DuckDB oracle SQL over the same tables.
  *
  * Contract notes (driver compare semantics):
  *   - column names must match the oracle exactly — alias every computed col;
  *   - results must be order-insensitive-deterministic: no floating-point
  *     aggregation order dependence (sums go through decimal), explicit
  *     tie-breaks on every window/top-k ordering.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
