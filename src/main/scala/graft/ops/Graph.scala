package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Companion to the
  * connected-components machinery in [[Dedup]] — same execution shape
  * (edge table checkpointed once, a slim per-node state frame joined
  * against it per round, `localCheckpoint` as the iteration barrier so
  * lineage never re-derives earlier rounds).
  */
object Graph {

  /** PageRank with damping 0.85 over a directed edge list, fixed
    * iteration count — entity-importance scoring (e.g. rank parts by
    * co-purchase centrality, domains by cross-link mass) where the
    * classic random-surfer weighting beats raw degree.
    *
    * EXACTNESS: ranks live in integer 1e12 units and every step is
    * integer arithmetic — `contrib = pr div out_deg`, `pr' =
    * floor(0.15·1e12/N) + (85·Σcontrib) div 100` — so results are
    * bit-identical across engines, partitionings, and retries (a float
    * PageRank is order-dependent in the Σ). Floor division leaks ≤1 unit
    * of mass per node per round (≈10⁻¹² relative) — ordering-irrelevant,
    * determinism-preserving.
    *
    * Scale shape: the edge table and (src, deg) join once and checkpoint
    * OUTSIDE the loop (they are re-read every round); each round is one
    * equi-join of the slim (node, pr) state against it plus one
    * partial-aggregated sum — the same per-round cost model as
    * pointer-jumping components (rounds × one shuffle). The state frame
    * checkpoints only every `checkpointInterval` rounds: a bounded
    * iteration count chains fine through Catalyst in one job, while long
    * runs need the barrier to cap lineage depth and stage-retry blast
    * radius (measured locally: per-round checkpoints tripled a 5-round
    * wall-clock in scheduler overhead alone). N (node count) is a
    * control-plane scalar. Nodes with no inbound edges settle at the base
    * rank; dangling nodes (no outbound) simply leak their mass — the
    * standard simplification; redistribute via one extra aggregate per
    * round if mass conservation matters.
    *
    * @param edges (src, dst) rows; pass both directions for undirected
    * @return (node, pr) — pr in 1e12 units
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      checkpointInterval: Int = 8): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").localCheckpoint() // (src, dst, deg), reused every round
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count() // control-plane scalar (drives two literals)
    val base = 150000000000L / n // floor(0.15 · 1e12 / N)
    var pr = nodes.withColumn("pr", lit(1000000000000L / n))
    for (i <- 1 to iterations) {
      val contrib = ed.join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("sc"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(sc, 0L)) div 100")).as("pr"))
      if (i % checkpointInterval == 0 && i < iterations) pr = pr.localCheckpoint()
    }
    pr
  }
}
