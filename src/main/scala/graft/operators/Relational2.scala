package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational surface, part 2 (SURVEY.md §2: A8 rollup/cube/grouping sets,
  * SO3 intersect/except, R1/R2 pivot/unpivot, F14 scalar suite, J7 range
  * join, as-of join, A9 sketches, correlated aggregates).
  */
object Relational2 {

  /** Exact 2-dp quantity as scaled long (see Relational.cents: identical
    * per-row IEEE arithmetic in both engines; long sums are exact and
    * codegen-fast where decimal sums go through BigDecimal buffers). */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5))

  // ---------------------------------------------------------------- q09
  // ROLLUP with grouping() disambiguators (null group vs null value).
  private def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls"),
        (sum(cents($"l_quantity")).cast("double") / 100.0).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy($"g_rf", $"g_ls", $"l_returnflag", $"l_linestatus")
  }
  private val q09Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q10
  // CUBE over two order dimensions.
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping($"o_orderstatus").cast("int").as("g_st"),
        grouping($"o_orderpriority").cast("int").as("g_pr"),
        count(lit(1)).as("n"),
        (sum(cents($"o_totalprice")).cast("double") / 100.0).as("sum_price"))
      .orderBy($"g_st", $"g_pr", $"o_orderstatus", $"o_orderpriority")
  }
  private val q10Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q11
  // Explicit GROUPING SETS via SQL (Catalyst Expand operator underneath).
  private def q11(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(grouping(c_mktsegment) AS INT) AS g_seg,
        |  CAST(grouping(c_nationkey) AS INT) AS g_nat,
        |  COUNT(*) AS n
        |FROM customer_v
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""".stripMargin)
  }
  private val q11Sql =
    """SELECT c_mktsegment, c_nationkey,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |  CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
      |  COUNT(*) AS n
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      |ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q12
  // Distinct projection + per-group distinct counts (A1/A2/A7).
  private def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("nd_part"),
        countDistinct($"l_suppkey").as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }
  private val q12Sql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS nd_part,
      |  COUNT(DISTINCT l_suppkey) AS nd_supp,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q13/q14
  // INTERSECT / EXCEPT (SO3): customers active in 1995 vs 1996.
  private def custkeysOfYear(s: SparkSession, d: String, y: Int): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).filter(year($"o_orderdate") === y).select($"o_custkey")
  }
  private def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    custkeysOfYear(s, d, 1995).intersect(custkeysOfYear(s, d, 1996))
      .orderBy($"o_custkey")
  }
  private val q13Sql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
      |ORDER BY o_custkey""".stripMargin
  private def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    custkeysOfYear(s, d, 1995).except(custkeysOfYear(s, d, 1996))
      .orderBy($"o_custkey")
  }
  private val q14Sql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q15
  // Union-by-name + distinct (SO1): entity/key pairs from two planes.
  private def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"), lit("customer").as("src"))
    val b = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey"), lit("supplier").as("src"))
    a.unionByName(b).distinct().orderBy($"nationkey", $"src")
  }
  private val q15Sql =
    """SELECT DISTINCT * FROM (
      |  SELECT CAST(c_nationkey AS INT) AS nationkey, 'customer' AS src FROM customer
      |  UNION ALL
      |  SELECT CAST(s_nationkey AS INT) AS nationkey, 'supplier' AS src FROM supplier)
      |ORDER BY nationkey, src""".stripMargin

  // ---------------------------------------------------------------- q16
  // Pivot (R1): orderstatus → columns, with explicit value list so the
  // output schema is static (required for both Catalyst planning at scale
  // and oracle parity). coalesce(n,0) aligns pivot's missing-combo null
  // with conditional aggregation's 0.
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }
  private val q16Sql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus='F') AS n_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus='O') AS n_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus='P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q17
  // Unpivot / melt (R2) — the reference's wide→EAV reshape on part.
  private def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .unpivot(
        Array($"p_partkey"),
        Array($"p_size".cast("double").as("p_size"), $"p_retailprice"),
        "attr", "val")
      .orderBy($"p_partkey", $"attr")
  }
  private val q17Sql =
    """SELECT p_partkey, attr, val FROM (
      |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part)
      |ORDER BY p_partkey, attr""".stripMargin

  // ---------------------------------------------------------------- q18
  // String function suite (F6-F8, F14).
  private def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select(
        $"p_partkey",
        lower($"p_brand").as("brand_lc"),
        upper($"p_type").as("type_uc"),
        length($"p_name").as("name_len"),
        substring($"p_name", 1, 8).as("name_pfx"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "[aeiou]", "").as("name_novowel"),
        trim(lit("  pad  ")).as("trimmed"),
        levenshtein($"p_brand", lit("Brand#13")).as("lev"),
        $"p_name".endsWith("e").cast("int").as("ends_e"),
        $"p_name".rlike("^[a-m]").cast("int").as("starts_am"))
      .orderBy($"p_partkey")
  }
  private val q18Sql =
    """SELECT p_partkey,
      |  lower(p_brand) AS brand_lc,
      |  upper(p_type) AS type_uc,
      |  length(p_name) AS name_len,
      |  substring(p_name, 1, 8) AS name_pfx,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
      |  trim('  pad  ') AS trimmed,
      |  levenshtein(p_brand, 'Brand#13') AS lev,
      |  CAST(suffix(p_name, 'e') AS INT) AS ends_e,
      |  CAST(regexp_matches(p_name, '^[a-m]') AS INT) AS starts_am
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q19
  // Math function suite (F14). Per-row IEEE double ops are bit-identical
  // across engines; only aggregation order isn't — none here.
  private def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_linenumber" === 1)
      .select(
        $"l_orderkey",
        // round-half-up spelled out in IEEE ops: Spark round() and DuckDB
        // round() disagree on which side of .xx5 a double falls.
        (floor($"l_extendedprice" * 0.1 * 100 + 0.5) / 100).as("r2"),
        abs($"l_discount" - 0.05).as("absd"),
        ceil($"l_quantity").as("ceilq"),
        floor($"l_quantity" / 7).as("floorq"),
        sqrt($"l_extendedprice").as("sqrtp"),
        // JVM Math.log and libm log differ in the last ulp (transcendentals
        // are not correctly-rounded by IEEE); quantize to 9 dp on both sides.
        (floor(log($"l_extendedprice") * 1e9 + 0.5) / 1e9).as("lnp"),
        pow($"l_quantity", lit(2)).as("q2"),
        ($"l_partkey" % 97).as("m97"))
      .orderBy($"l_orderkey")
  }
  private val q19Sql =
    """SELECT l_orderkey,
      |  floor(l_extendedprice * 0.1 * 100 + 0.5) / 100 AS r2,
      |  abs(l_discount - 0.05) AS absd,
      |  CAST(ceil(l_quantity) AS BIGINT) AS ceilq,
      |  CAST(floor(l_quantity / 7) AS BIGINT) AS floorq,
      |  sqrt(l_extendedprice) AS sqrtp,
      |  floor(ln(l_extendedprice) * 1e9 + 0.5) / 1e9 AS lnp,
      |  pow(l_quantity, 2) AS q2,
      |  l_partkey % 97 AS m97
      |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- q20
  // Date/time suite (F5 — the reference's 4 output granularities — plus
  // extraction and truncation).
  private def q20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("dom"),
        date_format($"o_orderdate", "yyyy").as("g_year"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("g_date"),
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm").as("g_minute"),
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("g_second"),
        date_trunc("month", $"o_orderdate").cast("date").cast("string").as("month_start"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy($"o_orderkey")
  }
  private val q20Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  strftime(o_orderdate, '%Y') AS g_year,
      |  strftime(o_orderdate, '%Y-%m-%d') AS g_date,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M') AS g_minute,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS g_second,
      |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
      |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q21
  // CASE WHEN bucketing + aggregation.
  private def q21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("band",
        when($"o_totalprice" < 50000, "low")
          .when($"o_totalprice" < 150000, "mid")
          .otherwise("high"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"o_totalprice")).cast("double") / 100.0).as("sum_price"))
      .orderBy($"band")
  }
  private val q21Sql =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            ELSE 'high' END AS band,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q22
  // Range (theta) join against a tiny constant band table → broadcast
  // nested-loop join; the broadcast side is O(1) rows at any scale.
  private def q22(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = s.createDataFrame(Seq(
      ("band0", 0.0, 100000.0),
      ("band1", 100000.0, 200000.0),
      ("band2", 200000.0, 1e9))).toDF("band", "lo", "hi")
    Tables.orders(s, d)
      .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n"))
      .orderBy($"band")
  }
  private val q22Sql =
    """SELECT band, COUNT(*) AS n FROM orders
      |JOIN (VALUES ('band0', 0.0, 100000.0),
      |             ('band1', 100000.0, 200000.0),
      |             ('band2', 200000.0, 1e9)) AS bands(band, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q23
  // As-of join (J7 EXT): for each error event, the most recent signup at or
  // before it for the same user. Implemented sort-based (union + running
  // last_value over one shuffle) — linear, no per-pair blowup at scale;
  // DuckDB's native ASOF JOIN is the oracle.
  private def q23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
    // signups sort before other rows at the same microsecond so an
    // equal-timestamp signup is visible to the error row (ASOF >= semantics).
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us", $"is_signup_first", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("is_signup_first", when($"event_type" === "signup", 0).otherwise(1))
      .withColumn("signup_ts_us",
        last(when($"event_type" === "signup", $"ts_us"), ignoreNulls = true).over(w))
      .filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"signup_ts_us")
      .orderBy($"user_id", $"event_id")
  }
  private val q23Sql =
    """SELECT e.user_id, e.event_id, epoch_us(s.ts) AS signup_ts_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.user_id, e.event_id""".stripMargin

  // ---------------------------------------------------------------- q83
  // The SAME as-of probe as q23, through the custom physical operator
  // (graft.plans.AsOfJoinExec): each side shuffles once on user_id in its
  // own width and a per-partition two-pointer merge attaches the latest
  // signup — no union detour, no window buffering. Same DuckDB ASOF oracle.
  private def q83(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts_us")
    // fresh attributes (aliases) — self-join sides must not share exprIds
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id".as("s_uid"), $"ts_us".as("s_ts"))
    graft.plans.AsOfJoinOps.asofBackward(
        errors, signups, Seq("user_id"), Seq("s_uid"), "ts_us", "s_ts")
      .select($"user_id", $"event_id", $"s_ts".as("signup_ts_us"))
      .orderBy($"user_id", $"event_id")
  }
  private val q83Sql =
    """SELECT e.user_id, e.event_id, epoch_us(s.ts) AS signup_ts_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.user_id, e.event_id""".stripMargin

  // ---------------------------------------------------------------- q24
  // Sketches (A9): HLL++ distinct + approximate percentiles, with an
  // EXACT-REGIME oracle gate. Sketch estimates differ by engine, so the
  // query emits (a) the exact distinct count (fully verified) and (b)
  // deterministic bounds-check booleans: HLL++ at rsd=0.01 must land
  // within 5% (5 sigma) of exact, and the approx median (accuracy 10000 →
  // rank error <= n/10000, ~2 ranks at sf0.01) must lie inside the exact
  // [p45, p55] band (~2000 ranks). The oracle emits TRUE literals — the
  // hash matches only when the sketches genuinely hit their bounds, so
  // this is a real accuracy gate, not a rows-only smoke check.
  private def q24(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey", 0.01).as("apx"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("apx_med"),
        expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"apx" - $"exact_parts") <= $"exact_parts" * 0.05).as("parts_ok"),
        ($"apx_med" >= $"lo" && $"apx_med" <= $"hi").as("median_ok"))
      .orderBy($"l_returnflag")
  }
  private val q24Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS parts_ok, TRUE AS median_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q25
  // Exact percentiles (linear interpolation — same formula in both engines).
  private def q25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .orderBy($"l_returnflag")
  }
  private val q25Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q26
  // Correlated aggregate (decorrelated to a join in both engines): orders
  // above their customer's average price. avg is exact decimal/count.
  private def q26(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val custAvg = Tables.orders(s, d)
      .groupBy($"o_custkey".as("ck"))
      .agg((sum(cents($"o_totalprice")).cast("double") / 100.0 / count(lit(1))).as("avg_price"))
    Tables.orders(s, d)
      .join(custAvg, $"o_custkey" === $"ck")
      .filter($"o_totalprice" > $"avg_price")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }
  private val q26Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |JOIN (SELECT o_custkey AS ck,
      |        CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price
      |      FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.ck
      |WHERE o_totalprice > avg_price
      |ORDER BY o_orderkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q09_rollup", q09, Some(q09Sql)),
    QueryDef("q10_cube", q10, Some(q10Sql)),
    QueryDef("q11_grouping_sets", q11, Some(q11Sql)),
    QueryDef("q12_count_distinct", q12, Some(q12Sql)),
    QueryDef("q13_intersect", q13, Some(q13Sql)),
    QueryDef("q14_except", q14, Some(q14Sql)),
    QueryDef("q15_union_distinct", q15, Some(q15Sql)),
    QueryDef("q16_pivot", q16, Some(q16Sql)),
    QueryDef("q17_unpivot", q17, Some(q17Sql)),
    QueryDef("q18_string_funcs", q18, Some(q18Sql)),
    QueryDef("q19_math_funcs", q19, Some(q19Sql)),
    QueryDef("q20_date_funcs", q20, Some(q20Sql)),
    QueryDef("q21_case_when", q21, Some(q21Sql)),
    QueryDef("q22_range_join", q22, Some(q22Sql)),
    QueryDef("q23_asof_join", q23, Some(q23Sql)),
    QueryDef("q24_approx_sketches", q24, Some(q24Sql)),
    QueryDef("q25_percentiles", q25, Some(q25Sql)),
    QueryDef("q26_correlated_avg", q26, Some(q26Sql)),
    QueryDef("q83_asof_custom", q83, Some(q83Sql)),
  )
}
