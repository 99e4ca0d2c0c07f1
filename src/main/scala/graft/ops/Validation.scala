package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/expectations
  * shape): a list of [[Validation.Check]]s compiles into ONE aggregation
  * pass over the table — every row-local predicate and every uniqueness
  * check becomes a column of the same global aggregate, so a 100 TB
  * validation sweep costs exactly one scan (plus one slim anti-join per
  * referential-integrity check, keyed on ids only). The report is a tiny
  * control-plane frame: (check, n_rows, n_violations, passed).
  *
  * This is the production gate that runs BETWEEN pipeline stages — the
  * reference's precondition asserts (project-info check, required-field
  * presence) generalized to data-shape contracts. Reference behavior:
  * redcap-etl.py's hard abort on malformed input; here the full violation
  * census is returned instead so callers choose warn-vs-fail per check.
  */
object Validation {

  sealed trait Check { def name: String }
  /** Violation: the column is NULL. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** Violation: every duplicate row beyond the first per key group. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Violation: non-null value outside [lo, hi]. Nulls are NotNull's job. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col)"
  }
  /** Violation: non-null value not in the accepted set. */
  final case class Accepted(col: String, values: Seq[String]) extends Check {
    def name = s"accepted($col)"
  }
  /** Violation: non-null child key with no matching parent key. The one
    * check that is not row-local: a left-anti join against the parent's
    * key column — only the two key columns cross the exchange, and the
    * parent side is typically broadcast-sized after distinct(). */
  final case class RefIntegrity(col: String, parent: DataFrame,
      parentCol: String) extends Check {
    def name = s"ref_integrity($col)"
  }

  private def violation(c: Check): Column = c match {
    case NotNull(col) => col_(col).isNull
    case InRange(col, lo, hi) =>
      col_(col).isNotNull && !(col_(col) >= lo && col_(col) <= hi)
    case Accepted(col, vs) => col_(col).isNotNull && !col_(col).isin(vs: _*)
    case other => throw new IllegalArgumentException(other.toString)
  }
  private def col_(n: String) = col(n)

  /** Run `checks` against `df`; one scan for all non-referential checks.
    * @return (check, n_rows, n_violations, passed), one row per check. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val rowLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: Accepted) => c
    }
    val uniques = checks.collect { case c: Unique => c }
    val refs = checks.collect { case c: RefIntegrity => c }

    // one global aggregate: count(*) + a conditional count per row-local
    // check + a count-distinct per uniqueness check (Spark plans the
    // multi-distinct via Expand; still a single pass over the input)
    val aggCols =
      count(lit(1)).as("__n") +:
        (rowLocal.zipWithIndex.map { case (c, i) =>
          count(when(violation(c), 1)).as(s"__v$i")
        } ++ uniques.zipWithIndex.map { case (u, i) =>
          count_distinct(struct(u.cols.map(col): _*)).as(s"__u$i")
        })
    // 1-row stats frame consumed once PER check row below — materialize,
    // or the full-table aggregation re-runs for every union branch
    val one = df.agg(aggCols.head, aggCols.tail: _*).localCheckpoint()

    val local = rowLocal.zipWithIndex.map { case (c, i) =>
      one.select(lit(c.name).as("check"), col("__n").as("n_rows"),
        col(s"__v$i").as("n_violations"))
    } ++ uniques.zipWithIndex.map { case (u, i) =>
      one.select(lit(u.name).as("check"), col("__n").as("n_rows"),
        (col("__n") - col(s"__u$i")).as("n_violations"))
    }

    val refReports = refs.map { r =>
      val parentKeys = r.parent.select(col(r.parentCol).as(r.col)).distinct()
      val orphans = df.select(col(r.col)).filter(col(r.col).isNotNull)
        .join(parentKeys, Seq(r.col), "left_anti")
      // row count comes from the materialized stats frame — no extra scan
      one.select(col("__n").as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
        .select(lit(r.name).as("check"), col("n_rows"), col("n_violations"))
    }

    (local ++ refReports).reduce(_.unionByName(_))
      .withColumn("passed", col("n_violations") === 0L)
  }
}
