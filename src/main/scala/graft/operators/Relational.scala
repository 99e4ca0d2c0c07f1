package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** General relational surface (SURVEY.md §2 EXT rows J7, A7–A9, §2.5 windows,
  * §2.6 sort/limit/top-k, SO3): hash aggregation, multi-way joins with
  * broadcast dims, semi/anti joins, window functions, top-k, set ops.
  *
  * Scale posture: fact-fact joins shuffle on their keys and rely on AQE for
  * skew; fixed-cardinality dims (`nation`, `region`) are explicitly
  * `broadcast()` — they stay tiny at any scale factor. `customer`/`orders`
  * grow with SF, so they are never broadcast.
  *
  * Oracle parity: every floating-point SUM goes through DECIMAL(18,2|4) so
  * the result is exact and identical regardless of aggregation order in
  * either engine; per-row double arithmetic is IEEE-identical everywhere.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  /** Exact 2-dp quantity as a scaled long: floor(x*100 + 0.5) recovers the
    * cent integer identically in every IEEE-754 engine (the columns are
    * non-negative 2-dp decimals stored as doubles). Aggregating longs keeps
    * the sum exact AND whole-stage-codegen fast — Spark's decimal sum goes
    * through BigDecimal-backed buffers, measured ~2× slower in the hot
    * aggregate at sf0.1; DuckDB itself aggregates decimals as scaled
    * integers. Headroom before ANSI overflow (throws, never wraps):
    * 2^63 / 1e9-per-row ≈ 9e9 rows per GROUP for the revenue term. */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5))
  /** Exact sum of a 2-dp quantity, rendered as double (integer sum, one
    * correctly-rounded division — value-identical to summing DECIMAL(18,2)
    * then casting). */
  private def dsum(c: Column): Column = sum(cents(c)).cast("double") / 100.0
  /** Exact revenue sum: Σ price·(1−discount) in cents·percent units. */
  private def revenueSum(price: Column, discount: Column): Column =
    sum(cents(price) * (lit(100L) - cents(discount))).cast("double") / 10000.0

  // ---------------------------------------------------------------- q01
  // TPC-H Q1-style pricing summary: scan-side filter pushed to parquet,
  // partial+final hash aggregation (A7).
  private def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("2000-01-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        revenueSum($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (sum(cents($"l_quantity")).cast("double") / 100.0 / count(lit(1))).as("avg_qty"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  // Multi-way join: shuffled fact join + broadcast dim joins (J7/J1).
  // Lineitem is PRE-AGGREGATED to one (orderkey, revenue) row before the
  // join: the fact join then moves |orders| rows instead of |lineitem|
  // (~4× fewer), and `n_orders` becomes a plain count — no count-distinct
  // expand. Revenue stays exact: a sum of per-order integer sums is the
  // total integer sum.
  private def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perOrder = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).as("rev"))
    perOrder
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        (sum($"rev").cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }
  private val q02Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(rev) AS DOUBLE) / 10000.0 AS revenue,
      |  COUNT(*) AS n_orders
      |FROM (SELECT l_orderkey,
      |        SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS rev
      |      FROM lineitem GROUP BY l_orderkey) l
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q03
  // Top-k: orderBy+limit → TakeOrderedAndProjectExec (no full sort at scale).
  // The limit is taken BELOW the enrichment join (revenue and the tie-break
  // key are fully determined by the aggregate), so orders is joined against
  // 10 broadcast rows instead of every group — Catalyst cannot push a limit
  // through a join itself. Relies on lineitem.l_orderkey ⊆ orders.o_orderkey
  // (TPC-H referential integrity); the oracle gate would flag a violation.
  private def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val topk = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(revenueSum($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy(desc("revenue"), $"l_orderkey")
      .limit(10)
    Tables.orders(s, d)
      .join(broadcast(topk), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderkey", $"o_orderdate", $"revenue")
      .orderBy(desc("revenue"), $"o_orderkey")
  }
  private val q03Sql =
    """SELECT o_orderkey, o_orderdate, revenue FROM (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
      |  FROM lineitem GROUP BY l_orderkey) r
      |JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  // Window ranking: top-3 orders per customer (§2.5). Tie-break on orderkey
  // makes row_number deterministic under distributed execution.
  private def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy(desc("o_totalprice"), $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }
  private val q04Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q05
  // Running sum over an explicit ROWS frame; decimal keeps the prefix sums
  // exact so frame evaluation order can't perturb the doubles.
  private def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running_value", sum(dec2($"value")).over(w).cast("double"))
      .select($"user_id", $"event_id", $"running_value")
      .orderBy($"user_id", $"event_id")
  }
  private val q05Sql =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q06
  // lag/lead: inter-event gap in microseconds + next event type per user.
  private def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select(
        $"user_id", $"event_id",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
        lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"user_id", $"event_id")
  }
  private val q06Sql =
    """SELECT user_id, event_id,
      |  epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
      |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q07
  // Left-semi join (EXISTS, J5/J7): customers with ≥1 urgent order.
  private def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
  private val q07Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  // Left-anti join (NOT EXISTS, A6 error-channel pattern): customers with no
  // orders at all.
  private def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  private val q08Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_revenue_by_nation", q02, Some(q02Sql)),
    QueryDef("q03_top_orders", q03, Some(q03Sql)),
    QueryDef("q04_window_rank", q04, Some(q04Sql)),
    QueryDef("q05_running_sum", q05, Some(q05Sql)),
    QueryDef("q06_lag_lead", q06, Some(q06Sql)),
    QueryDef("q07_semi_join", q07, Some(q07Sql)),
    QueryDef("q08_anti_join", q08, Some(q08Sql)),
  )
}
