package graft.operators

import graft.SparkSpec
import graft.SparkEntry

/** Registry-wide no-recompute audit: no query's PHYSICAL plan may scan the
  * same parquet table more than twice. One scan is the norm; two covers
  * legitimate self-joins / two-pass shapes; three or more almost always
  * means a shared sub-aggregate fans out without materialization — the
  * exact defect class that made q205/q207 the two slowest round-3 queries
  * (the risk-table / distinct-value-axis frames re-derived their upstream
  * fact aggregation per consumer). This sweep guards the whole registry as
  * it grows: a new query that forgets the materialize-slim-frames
  * discipline fails here by name.
  *
  * Scans that Spark itself deduplicates (ReusedExchange/ReuseSubquery)
  * still print one Location per node, so the count is conservative — an
  * allowlisted query documents WHY its multi-scan is intentional.
  */
class NoRecomputeSweepSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** (query, table) pairs allowed to exceed 2 scans, with justification. */
  private val allow: Map[String, Set[String]] = Map(
    // Survivorship merges three measures read under DISJOINT pushed
    // event_type filters (full base agg + latest-click + latest-view):
    // each scan reads a different slice straight off the parquet scan —
    // merging them into one pass would lose the pushdown and read the
    // union of columns/rows for every measure.
    "q123_survivorship" -> Set("events")
  )

  test("no registered query's physical plan scans a parquet table " +
      "more than twice") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        tables.flatMap { t =>
          val n = s"$t\\.parquet".r.findAllIn(plan).size
          if (n > 2 && !allow.getOrElse(name, Set.empty).contains(t))
            Some(s"$name scans $t $n times")
          else None
        }
      }
    assert(offenders.isEmpty,
      "multi-scan plans (materialize the shared frame or allowlist " +
        "with a reason):\n" + offenders.mkString("\n"))
  }
}
