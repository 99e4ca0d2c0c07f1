package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational surface, part 3: the rest of the §2.5 window surface and the
  * streaming aggregation shape pinned as a batch query.
  */
object Relational3 {

  // ---------------------------------------------------------------- q27
  // Full ranking-function family + a RANGE frame in one pass over orders.
  private def q27(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byPrice = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    // RANGE frame keyed on price: peers = equal price
    val rangeW = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(
        $"o_orderkey", $"o_orderpriority", $"o_totalprice",
        row_number().over(byPrice).as("rn"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"),
        ntile(4).over(byPrice).as("quartile"),
        count(lit(1)).over(rangeW).as("n_cheaper_or_equal"))
      .filter($"rn" <= 50)
      .orderBy($"o_orderpriority", $"rn")
  }
  private val q27Sql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice, rn, rnk, drnk, quartile, n_cheaper_or_equal
      |FROM (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER w AS rn,
      |    RANK() OVER w AS rnk,
      |    DENSE_RANK() OVER w AS drnk,
      |    CAST(NTILE(4) OVER w AS INT) AS quartile,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
      |                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_cheaper_or_equal
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE rn <= 50
      |ORDER BY o_orderpriority, rn""".stripMargin

  // ---------------------------------------------------------------- q28
  // The streaming tumbling-window aggregation (EventStreams.tumblingCounts)
  // as a batch plan — same window() operator the streaming path runs, so
  // the oracle gate covers the streaming semantics too.
  private def q28(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.streaming.EventStreams.tumblingCountsBatch(Tables.events(s, d), "1 hour")
      .withColumn("w_start", date_format($"w_start", "yyyy-MM-dd HH:mm"))
      .orderBy($"w_start", $"event_type")
  }
  private val q28Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS w_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q29
  // JSON extraction (F11 read side): events.props carries JSON documents;
  // extract, cast, aggregate.
  private def q29(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n_with_k"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }
  private val q29Sql =
    """SELECT event_type,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q51
  // Sliding windows: each event lands in length/slide = 2 overlapping
  // windows; the oracle reconstructs the assignment with a UNION ALL of the
  // two hour-truncated starts.
  private def q51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("w_start"),
        $"event_type", $"n")
      .orderBy($"w_start", $"event_type")
  }
  private val q51Sql =
    """SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS w_start, event_type, COUNT(*) AS n
      |FROM (
      |  SELECT date_trunc('hour', ts) AS w_start, event_type FROM events
      |  UNION ALL
      |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events)
      |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q52
  // Typed Dataset surface (§1.4: Dataset[T] for fixed contracts): case-class
  // rows through groupByKey/mapGroups — the per-group imperative escape
  // hatch, verified against plain SQL aggregation.
  private def q52(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        var n = 0L
        var errors = 0L
        var cents = 0L
        rows.foreach { case (_, tpe, v) =>
          n += 1
          if (tpe == "error") errors += 1
          cents += math.rint(v * 100).toLong
        }
        (uid, n, errors, cents.toDouble / 100)
      }
      .toDF("user_id", "n", "n_errors", "sum_value")
      .orderBy($"user_id")
  }
  private val q52Sql =
    """SELECT user_id, COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q76
  // Group top-k WITHOUT a window sort: the typed TopK Aggregator keeps a
  // bounded per-group heap, partial-aggregates map-side, and merges heaps
  // across partitions — at scale the exchange carries k ids per group
  // instead of every row, where the q04-style window formulation must
  // shuffle + sort the whole table. The oracle is the ROW_NUMBER
  // formulation — both must agree exactly (same desc-value, asc-id order).
  private def q76(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val topk = udaf(new graft.functions.Aggregators.TopK(3))
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(topk($"o_totalprice", $"o_orderkey").as("ids"))
      .select($"o_orderpriority", posexplode($"ids").as(Seq("i", "o_orderkey")))
      .select($"o_orderpriority", ($"i" + 1).cast("int").as("rn"), $"o_orderkey")
      .orderBy($"o_orderpriority", $"rn")
  }
  private val q76Sql =
    """SELECT o_orderpriority, rn, o_orderkey FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  // ---------------------------------------------------------------- q79
  // Bucketed range join at band-table scale: 1000 OVERLAPPING price bands
  // (stride 600, width 1200 → every order lands in ≤2 bands) would cost
  // 1000 comparisons per order as the q22-style nested loop; the bucket
  // equi-join + residual filter shuffles each order to its one bucket.
  private def q79(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = s.range(1000).select($"id".as("band_id"),
      ($"id" * 600.0).as("lo"), ($"id" * 600.0 + 1200.0).as("hi"))
    graft.ops.RangeJoin.bucketedRangeJoin(
        Tables.orders(s, d).select($"o_orderkey", $"o_totalprice"),
        "o_totalprice", bands, "lo", "hi", bucketWidth = 600.0)
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n"))
      .orderBy($"band_id")
  }
  private val q79Sql =
    """SELECT band_id, COUNT(*) AS n
      |FROM orders
      |JOIN (SELECT i AS band_id, i * 600.0e0 AS lo, i * 600.0e0 + 1200.0e0 AS hi
      |      FROM range(1000) t(i)) bands
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band_id ORDER BY band_id""".stripMargin

  // ---------------------------------------------------------------- q75
  // Salted hot-key aggregation under oracle: event_type has a handful of
  // values over ~150k rows/sf — exactly the single-hot-group shape AQE
  // can't split (aggregation, not join). Skew.saltedAgg spreads each group
  // over 8 salted partials before the final combine; the oracle is the
  // plain GROUP BY — salting must be invisible in the result.
  private def q75(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Skew.saltedAgg(
        Tables.events(s, d).select($"event_type", $"user_id"),
        keys = Seq("event_type"), saltBuckets = 8)(
        ("user_id", sum, sum))
      .select($"event_type", $"user_id".as("sum_uid"))
      .orderBy($"event_type")
  }
  private val q75Sql =
    """SELECT event_type, CAST(SUM(user_id) AS BIGINT) AS sum_uid
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q85
  // Heavy hitters via the native SpaceSaving TypedImperativeAggregate
  // (A9): the map side ships one capacity-bounded sketch per partition.
  // capacity 64 ≥ |distinct event_type| → zero eviction → counts exact and
  // partitioning-independent — which is what lets DuckDB's plain GROUP BY
  // COUNT be the oracle. The approximate (evicting) regime is spec-gated
  // instead (HeavyHittersSpec bounds).
  private def q85(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .agg(graft.functions.HeavyHitters($"event_type", 64).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item".as("event_type"), $"e.cnt".as("cnt"))
      .orderBy(desc("cnt"), $"event_type")
  }
  private val q85Sql =
    """SELECT event_type, COUNT(*) AS cnt FROM events
      |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q27_window_family", q27, Some(q27Sql)),
    QueryDef("q28_tumbling_window", q28, Some(q28Sql)),
    QueryDef("q29_json_extract", q29, Some(q29Sql)),
    QueryDef("q51_sliding_window", q51, Some(q51Sql)),
    QueryDef("q52_typed_groups", q52, Some(q52Sql)),
    QueryDef("q75_salted_agg", q75, Some(q75Sql)),
    QueryDef("q76_topk_agg", q76, Some(q76Sql)),
    QueryDef("q79_bucketed_range_join", q79, Some(q79Sql)),
    QueryDef("q85_heavy_hitters", q85, Some(q85Sql)),
  )
}
