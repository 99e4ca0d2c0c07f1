package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Md5Low64

/** Count-min sketch (Cormode–Muthukrishnan) as DataFrame transforms —
  * the fixed-width mergeable frequency summary that complements the
  * SpaceSaving heavy-hitters aggregate: SpaceSaving answers "which keys
  * are big", CMS answers "how big is THIS key" for any key, in
  * depth×width longs regardless of cardinality.
  *
  * Determinism: bucket hashes are md5-low64 of "cms<r>:<token>" masked to
  * the width (DuckDB `md5_number_lower(...) & (width-1)` parity — the low
  * bits of the signed and unsigned readings agree), counters are exact
  * long counts, estimates are MIN over exact counters — every value
  * reproduces cross-engine, unlike a seeded-murmur sketch. The classic
  * guarantee holds: estimate ≥ exact, overcount ≤ εN w.h.p.
  *
  * Scale shape: building is one Generate ×depth over the token stream
  * into a partial+final hash aggregate whose exchange carries ≤
  * depth·width rows — a fixed-size frame no matter the corpus; merging
  * shards/days is elementwise long addition of those frames (the
  * incremental-maintenance contract). Estimation joins a control-plane
  * term list against the sketch.
  */
object Sketches {

  /** Bucket of `token` in sketch row `r` (width must be a power of two). */
  def cmsBucket(token: Column, r: Int, width: Int): Column = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"cms width must be a power of two; got $width")
    Md5Low64(concat(lit(s"cms$r:"), token))
      .bitwiseAND(lit((width - 1).toLong))
  }

  /** Build the sketch over a token-occurrence frame.
    * @return (r, bucket, cnt) — at most depth·width rows */
  def cmsBuild(toks: DataFrame, tokenCol: String = "t",
      depth: Int = 4, width: Int = 256): DataFrame =
    toks
      .select(posexplode(array((0 until depth).map(r =>
        cmsBucket(col(tokenCol), r, width)): _*)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Point-estimate the given terms against a built sketch: min counter
    * across rows. Terms must be a control-plane-sized frame. The join is
    * LEFT with a 0 default: a bucket the stream never touched has no
    * sketch row but its counter is 0 — an unseen term must estimate 0
    * (and never vanish), or the ≥-exact/≤-εN contract breaks.
    * @return (<tokenCol>, cms_est) */
  def cmsEstimate(sketch: DataFrame, terms: DataFrame, tokenCol: String = "t",
      depth: Int = 4, width: Int = 256): DataFrame =
    terms
      .select(col(tokenCol), posexplode(array((0 until depth).map(r =>
        cmsBucket(col(tokenCol), r, width)): _*)).as(Seq("r", "bucket")))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
