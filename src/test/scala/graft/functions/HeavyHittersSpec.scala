package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters TypedImperativeAggregate: exact regime ≡
  * GROUP BY under any partitioning; approximate regime holds the classic
  * bounds (upper-bound counts, bounded overcount, guaranteed presence of
  * items above n/capacity); SQL surface via extension injection. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: item i appears ~1000/i times (zipf-ish), n = 2281
  private def skewed = (1 to 10).flatMap(i => Seq.fill(1000 / i)(s"item$i"))

  private def hh(df: org.apache.spark.sql.DataFrame, capacity: Int): Seq[(String, Long, Long)] =
    df.agg(HeavyHitters($"s", capacity).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime (capacity >= distinct): counts ≡ GROUP BY, any partitioning") {
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val got = hh(skewed.toDF("s").repartition(parts), capacity = 16)
      assert(got.map { case (i, c, _) => i -> c }.toMap == truth, s"parts=$parts")
      assert(got.forall(_._3 == 0L)) // no eviction -> zero overcount
      // count-descending with item tie-break
      assert(got == got.sortBy { case (i, c, _) => (-c, i) })
    }
  }

  test("approximate regime: upper-bound counts, bounded overcount, " +
      "frequent items guaranteed present") {
    val n = skewed.size.toLong
    val capacity = 4
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = hh(skewed.toDF("s").repartition(5), capacity)
    assert(got.size <= capacity)
    got.foreach { case (item, cnt, err) =>
      val t = truth(item)
      assert(cnt >= t, s"$item: estimate $cnt below true $t")      // upper bound
      assert(cnt - err <= t, s"$item: lower bound ${cnt - err} above true $t")
    }
    // SpaceSaving guarantee: true frequency > n/capacity => present.
    // Merged partial sketches sum the per-partition floors, so the bound
    // loosens by the merge fan-in; item1 (1000 of 2281) clears any of them.
    assert(got.exists(_._1 == "item1"))
  }

  test("null items are ignored; empty input yields an empty array") {
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("s")
    val got = hh(withNulls.select($"s"), capacity = 8)
    assert(got.map { case (i, c, _) => i -> c }.toMap == Map("a" -> 2L, "b" -> 1L))
    val empty = hh(Seq.empty[String].toDF("s"), capacity = 8)
    assert(empty.isEmpty)
  }

  test("long items and SQL registration through extensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.registerExtensionFunctions(ext, spark)
    Seq(1L, 1L, 2L, 1L, 3L, 2L).toDF("v").createOrReplaceTempView("hh_t")
    val rows = spark.sql(
      "SELECT e.item, e.cnt FROM (SELECT explode(heavy_hitters(v, 8)) AS e FROM hh_t)")
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }
}
