package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-hierarchy operators (org charts, bills of materials, category
  * trees): the `WITH RECURSIVE` family, which Spark SQL lacks, expressed as
  * a driver-bounded iterative join loop — the same execution shape a
  * recursive CTE plans on engines that have one (DuckDB is the oracle).
  *
  * Scale shape: each round is ONE equi-join of the live frontier against
  * the edge table, shuffling only (node, anc, depth) triples; rounds =
  * hierarchy depth (bounded by `maxDepth`, typically ≤ 20 for real
  * hierarchies — cf. Dedup.connectedComponents' pointer jumping for
  * unbounded-diameter graphs). `localCheckpoint` cuts the per-round
  * lineage so the loop doesn't re-execute prior rounds, and the frontier
  * emptiness probe is a `limit(1)` existence check, not a count.
  */
object Hierarchy {

  /** Ancestor closure: every (node, ancestor, depth ≥ 1) pair reachable by
    * following `child → parent` edges. Nodes absent from `edges`' child
    * column contribute nothing (roots have no ancestors).
    *
    * `edges` must be acyclic up to `maxDepth`; the loop stops at `maxDepth`
    * regardless (a cycle would otherwise never converge — callers that
    * can't prove acyclicity get a depth-capped closure, never a hang).
    */
  def ancestors(edges: DataFrame, child: String, parent: String,
      maxDepth: Int = 20): DataFrame = {
    val e = edges.select(col(child).as("node"), col(parent).as("anc"))
    // depth 1: the edges themselves
    var level = e.withColumn("depth", lit(1)).localCheckpoint(eager = true)
    var closure = level
    var depth = 1
    while (depth < maxDepth && !level.isEmpty) {
      // next level: the frontier's ancestors, one more hop up
      val hop = e.select(col("node").as("j_node"), col("anc").as("j_anc"))
      level = level.join(hop, level("anc") === hop("j_node"))
        .select(col("node"), col("j_anc").as("anc"),
          (col("depth") + 1).as("depth"))
        .localCheckpoint(eager = true)
      closure = closure.unionByName(level)
      depth += 1
    }
    closure
  }
}
