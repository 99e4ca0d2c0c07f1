package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket mining — pairwise association rules (support /
  * confidence / lift), the classic co-occurrence analysis behind
  * "customers who bought A also bought B" and, in a training-data
  * pipeline, behind tag/source co-occurrence audits. Agrawal &
  * Srikant's Apriori insight applies in its simplest exact form here:
  * for PAIR rules the one support threshold on the pair count is the
  * whole frontier, so no candidate-generation loop is needed — one
  * in-row pair generation and two aggregations produce every rule.
  *
  * Scale shape: baskets aggregate once into distinct-item arrays
  * (map-side combinable), pair generation is in-row via
  * [[Graph.orderedPairs]] (k(k−1)/2 rows per basket, whole-stage
  * codegen), and both count frames are map-side partial aggregates.
  * The quadratic term is bounded by the basket-size contract —
  * `graft.mining.maxBasketSize` raises a named error at build time
  * (the [[Graph.guardDegree]] discipline) instead of letting one
  * degenerate mega-basket emit k² rows. Item counts join the pair
  * frame on the pair's own keys (shuffle join — the item table is
  * corpus-vocabulary-sized, deliberately NOT broadcast).
  *
  * EXACTNESS: counts are exact longs; confidence and lift are emitted
  * in floor-quantized 1e6 units via DECIMAL(38,0) products (1e6·n_ab·N
  * overflows int64 at warehouse scale), so results are bit-identical
  * across engines and partitionings.
  *
  * Relation to q196 (`operators/Relational3.scala`): q196 is the RANKED
  * readout — directed ante→cons rules, double-typed metrics, top-40 by
  * lift. This operator is the EXACT full rule table — unordered
  * canonical pairs, both confidence directions, integer-quantized
  * metrics, no cut — the form a downstream job (recommender candidate
  * generation, co-occurrence pruning) consumes whole; it also carries
  * the basket-size guard q196's per-query shape doesn't need.
  */
object Mining {

  private def guardBasket(b: DataFrame, itemsCol: String): DataFrame = {
    val cap = b.sparkSession.conf
      .get("graft.mining.maxBasketSize", "100000").toLong
    val t = b.schema(b.schema.fieldIndex(itemsCol)).dataType.catalogString
    b.withColumn(itemsCol,
      when(size(col(itemsCol)) <= cap, col(itemsCol))
        .otherwise(raise_error(concat(
          lit(s"basket size cap graft.mining.maxBasketSize=$cap exceeded: "),
          lit("a basket holds "), size(col(itemsCol)).cast("string"),
          lit(" distinct items — pair generation is quadratic per basket; " +
            "split or pre-filter degenerate baskets upstream, or raise " +
            "the conf if baskets this wide are genuinely intended")))
          .cast(t)))
  }

  /** Pairwise association rules from (basket_id, item) rows.
    *
    * @param rows           two-column frame: basket id, item
    * @param minPairSupport keep pairs co-occurring in ≥ this many baskets
    * @return one row per unordered item pair (item_a < item_b):
    *         n_ab (pair support), n_a / n_b (item supports),
    *         n_baskets, conf_ab_e6 = ⌊1e6·n_ab/n_a⌋,
    *         conf_ba_e6 = ⌊1e6·n_ab/n_b⌋,
    *         lift_e6 = ⌊1e6·n_ab·N/(n_a·n_b)⌋
    */
  def pairRules(rows: DataFrame, basketCol: String, itemCol: String,
      minPairSupport: Long): DataFrame = {
    val baskets = guardBasket(
      rows.groupBy(col(basketCol).as("__b"))
        .agg(collect_set(col(itemCol)).as("items")),
      "items")
      // item counts, pair generation and the basket total all read this
      // one slim (basket → distinct items) frame; never recompute it
      .localCheckpoint()
    val nb = baskets.agg(count(lit(1)).cast("decimal(38,0)").as("n_baskets"))
    val items = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = Graph.orderedPairs(baskets, "items")
      .groupBy(col("src").as("item_a"), col("dst").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    pairs
      .join(items.select(col("item").as("item_a"), col("n_item").as("n_a")),
        "item_a")
      .join(items.select(col("item").as("item_b"), col("n_item").as("n_b")),
        "item_b")
      .crossJoin(nb)
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_baskets").cast("long").as("n_baskets"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_ab) div n_a")
          .as("conf_ab_e6"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_ab) div n_b")
          .as("conf_ba_e6"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_ab * n_baskets) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_e6"))
  }
}
