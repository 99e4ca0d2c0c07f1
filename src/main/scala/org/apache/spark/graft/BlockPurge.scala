package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.RDDBlockId

/** Bench-isolation shim (package-internal Spark API, same pattern as
  * [[org.apache.spark.sql.graft.Bridge]]).
  *
  * `SparkContext.persistentRdds` holds WEAK references: once a query's
  * DataFrames go out of scope and a minor GC clears the RDD objects, the
  * entries vanish from `getPersistentRDDs` — but their BLOCKS (including
  * localCheckpoint blocks, which are plain persisted blocks) stay in the
  * block store until the ContextCleaner's own weak-ref queue drains after
  * a later GC. A bench loop that unpersists only `getPersistentRDDs`
  * therefore leaks exactly the blocks it most wants gone, and the leak
  * squeezes execution memory for every subsequent query (round-7 verdict:
  * the warm pass measured SLOWER than cold). This shim asks the
  * BlockManagerMaster for every RDD block actually present and removes
  * them by rdd id — deterministic, no GC required. */
object BlockPurge {

  /** Remove every RDD block in the block store; returns the number of
    * distinct RDDs purged. Safe between independent queries: a live RDD
    * loses only its cache (recomputable), and bench queries share no
    * state by design. */
  def purgeRddBlocks(sc: SparkContext): Int = {
    val master = sc.env.blockManager.master
    val rddIds = master
      .getMatchingBlockIds(_.isRDD, askStorageEndpoints = true)
      .collect { case RDDBlockId(rddId, _) => rddId }.toSet
    rddIds.foreach(id => master.removeRdd(id, blocking = true))
    rddIds.size
  }
}
