package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.etl.{DateShift, PhiFilter, Reshape, DictionaryMerge}

/** The reference's ETL operators (SURVEY.md §2.2 P4, §2.9 R1-R3, §2.3 J6,
  * §2.8 F1-F5) driven through the DuckDB-oracle gate by synthesizing EAV
  * planes from the relational test tables — same operator code paths the
  * redcap pipeline uses, verifiable against plain SQL.
  */
object EtlQueries {

  // ---------------------------------------------------------------- q30
  // Wide→EAV unpivot (R2) over customer.
  private def customerEav(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = Tables.customer(s, d).select(
      $"c_custkey".cast("string").as("record_id"),
      $"c_name",
      $"c_mktsegment",
      $"c_nationkey".cast("string").as("c_nationkey"),
      // decimal render: "123.45" in both engines (double→string differs)
      $"c_acctbal".cast("decimal(12,2)").cast("string").as("c_acctbal"))
    Reshape.unpivotWide(wide, "record_id",
      Seq("c_name", "c_mktsegment", "c_nationkey", "c_acctbal"))
  }
  private def q30(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customerEav(s, d).orderBy($"record_id", $"field_name")
  }
  private val q30Sql =
    """SELECT record_id, field_name, field_value FROM (
      |  SELECT CAST(c_custkey AS VARCHAR) AS record_id, 'c_name' AS field_name, c_name AS field_value FROM customer
      |  UNION ALL
      |  SELECT CAST(c_custkey AS VARCHAR), 'c_mktsegment', c_mktsegment FROM customer
      |  UNION ALL
      |  SELECT CAST(c_custkey AS VARCHAR), 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
      |  UNION ALL
      |  SELECT CAST(c_custkey AS VARCHAR), 'c_acctbal', CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) FROM customer)
      |ORDER BY record_id, field_name""".stripMargin

  // ---------------------------------------------------------------- q31
  // EAV→wide pivot (R1): round-trip the q30 plane back to one row per
  // customer with a static column list.
  private def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Reshape.pivotEav(customerEav(s, d),
      values = Seq("c_name", "c_mktsegment", "c_nationkey", "c_acctbal"))
      .orderBy($"record_id")
  }
  private val q31Sql =
    """SELECT CAST(c_custkey AS VARCHAR) AS record_id,
      |  c_name, c_mktsegment,
      |  CAST(c_nationkey AS VARCHAR) AS c_nationkey,
      |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS c_acctbal
      |FROM customer ORDER BY record_id""".stripMargin

  // ---------------------------------------------------------------- q32
  // PHI rule cascade (P4): field-map statuses Include / Include+event
  // restriction / Exclude / date-cleaned / unknown, exercised on an EAV
  // plane synthesized from part. The oracle spells the cascade out in SQL.
  private def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = Tables.part(s, d).select(
      $"p_partkey".cast("string").as("record_id"),
      when($"p_partkey" % 2 === 0, "event_a").otherwise("event_b").as("redcap_event_name"),
      $"p_name",
      $"p_brand",
      $"p_type",
      $"p_size".cast("string").as("p_size"),
      $"p_retailprice".cast("decimal(12,2)").cast("string").as("p_retailprice"))
    val eav = wide.unpivot(
        Array($"record_id", $"redcap_event_name"),
        Array($"p_name", $"p_brand", $"p_type", $"p_size", $"p_retailprice"),
        "field_name", "value")
      .withColumn("redcap_repeat_instrument", lit(""))
      .withColumn("redcap_repeat_instance", lit(""))
      // even part keys had their "date" field cleaned upstream
      .withColumn("kpmp_date_cleaned",
        when($"field_name" === "p_retailprice" && $"record_id".cast("long") % 2 === 0, true))
      .withColumn("kpmp_date_cleaned_type", lit(null).cast("string"))
    val fieldMap = s.createDataFrame(Seq(
      ("p_name", "Include", null.asInstanceOf[String]),
      ("p_brand", "Include", "event_a"),
      ("p_type", "Exclude", null.asInstanceOf[String]),
      ("p_retailprice", "TransformDate", null.asInstanceOf[String])
      // p_size intentionally absent → unknown-field drop
    )).toDF("field_name", "status", "restrict_to_event_list")
    PhiFilter(eav, fieldMap).kept
      .select($"record_id", $"field_name", $"value".as("field_value"))
      .orderBy($"record_id", $"field_name")
  }
  private val q32Sql =
    """WITH eav AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS record_id,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'event_a' ELSE 'event_b' END AS ev,
      |         f.field_name, f.field_value,
      |         (f.field_name = 'p_retailprice' AND p_partkey % 2 = 0) AS cleaned
      |  FROM part CROSS JOIN LATERAL (
      |    SELECT * FROM (VALUES
      |      ('p_name', p_name), ('p_brand', p_brand), ('p_type', p_type),
      |      ('p_size', CAST(p_size AS VARCHAR)),
      |      ('p_retailprice', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR))
      |    ) AS t(field_name, field_value)) f)
      |SELECT record_id, field_name, field_value FROM eav
      |WHERE field_name = 'p_name'
      |   OR (field_name = 'p_brand' AND ev = 'event_a')
      |   OR (field_name = 'p_retailprice' AND cleaned)
      |ORDER BY record_id, field_name""".stripMargin

  // ---------------------------------------------------------------- q33
  // Fixed-seconds date shift (F1/F2/F5) at minute granularity over an EAV
  // built from events timestamps rendered as lenient ISO strings.
  private def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val eav = Tables.events(s, d).select(
      $"event_id".cast("string").as("record_id"),
      lit("").as("redcap_event_name"),
      lit("").as("redcap_repeat_instrument"),
      lit("").as("redcap_repeat_instance"),
      lit("ev_ts").as("field_name"),
      date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("value"),
      lit(null).cast("boolean").as("kpmp_date_cleaned"),
      lit(null).cast("string").as("kpmp_date_cleaned_type"))
    val fieldMap = s.createDataFrame(Seq(("ev_ts", "TransformDateTime")))
      .toDF("field_name", "status")
    DateShift.fixedShift(eav, fieldMap, 3600L).eav
      .select($"record_id", $"value")
      .orderBy($"record_id".cast("long"))
  }
  private val q33Sql =
    """SELECT CAST(event_id AS VARCHAR) AS record_id,
      |  strftime(CAST(strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
      |           + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M') AS value
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q34
  // Checkbox one-hot → array (R3): line numbers as one-hot columns per
  // order, collapsed to the sorted code list.
  private def q34(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .pivot("l_linenumber", (1 to 7).map(_.toString))
      .agg(count(lit(1)))
    val oneHot = (1 to 7).foldLeft(p) { (df, i) =>
      df.withColumn(s"ln___$i",
        when(col(s"`$i`") > 0, "1").otherwise("0")).drop(i.toString)
    }
    Reshape.checkboxToArray(oneHot, "ln", "codes")
      .select($"l_orderkey", array_join($"codes", ",").as("codes"))
      .orderBy($"l_orderkey")
  }
  private val q34Sql =
    """SELECT l_orderkey,
      |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS codes
      |FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- q35
  // Dictionary curation upsert (J6): fresh universe, existing curation wins
  // on the curated columns only.
  private def q35(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fresh = Tables.part(s, d).select(
      $"p_partkey".cast("string").as("field_name"),
      lit(null).cast("string").as("status"),
      $"p_type".as("field_type"),
      lit(null).cast("string").as("notes"))
    val existing = Tables.part(s, d)
      .filter($"p_partkey" % 3 === 0)
      .select(
        $"p_partkey".cast("string").as("field_name"),
        lit("Include").as("status"),
        concat(lit("curated-"), $"p_partkey").as("notes"))
    DictionaryMerge.upsert(fresh, existing)
      .orderBy($"field_name")
  }
  private val q35Sql =
    """SELECT CAST(p.p_partkey AS VARCHAR) AS field_name,
      |  CASE WHEN p.p_partkey % 3 = 0 THEN 'Include' END AS status,
      |  p.p_type AS field_type,
      |  CASE WHEN p.p_partkey % 3 = 0 THEN 'curated-' || p.p_partkey END AS notes
      |FROM part p ORDER BY field_name""".stripMargin

  // ---------------------------------------------------------------- q36
  // Error side-channel (A6): the unknown-field report from the same
  // synthesized plane as q32 — distinct fields absent from the map.
  private def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = Tables.part(s, d).select(
      $"p_partkey".cast("string").as("record_id"),
      lit("event_a").as("redcap_event_name"),
      $"p_name", $"p_brand",
      $"p_size".cast("string").as("p_size"))
    val eav = wide.unpivot(
        Array($"record_id", $"redcap_event_name"),
        Array($"p_name", $"p_brand", $"p_size"),
        "field_name", "value")
      .withColumn("redcap_repeat_instrument", lit(""))
      .withColumn("redcap_repeat_instance", lit(""))
      .withColumn("kpmp_date_cleaned", lit(null).cast("boolean"))
      .withColumn("kpmp_date_cleaned_type", lit(null).cast("string"))
    val fieldMap = s.createDataFrame(Seq(
      ("p_name", "Include", null.asInstanceOf[String])
    )).toDF("field_name", "status", "restrict_to_event_list")
    PhiFilter(eav, fieldMap).unknownFields.orderBy($"field_name")
  }
  private val q36Sql =
    """SELECT field_name FROM (VALUES ('p_brand'), ('p_size')) AS t(field_name)
      |ORDER BY field_name""".stripMargin

  // ---------------------------------------------------------------- q37
  // Lenient multi-granularity ISO parse (F1): events timestamps rendered at
  // 4 different granularities by id, parsed back with the coalesce chain,
  // re-rendered at seconds. Unparseable granularities (year/month-only)
  // parse to period starts — matching dateutil.isoparse defaults.
  private def q37(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rendered = Tables.events(s, d).select(
      $"event_id",
      when($"event_id" % 4 === 0, date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
        .when($"event_id" % 4 === 1, date_format($"ts", "yyyy-MM-dd'T'HH:mm"))
        .when($"event_id" % 4 === 2, date_format($"ts", "yyyy-MM-dd"))
        .otherwise(date_format($"ts", "yyyy-MM")).as("raw"))
    rendered.select($"event_id",
      date_format(graft.functions.LenientDate.parseTs($"raw"), "yyyy-MM-dd HH:mm:ss").as("parsed"))
      .orderBy($"event_id")
  }
  private val q37Sql =
    """SELECT event_id,
      |  strftime(CASE
      |    WHEN event_id % 4 = 0 THEN strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
      |    WHEN event_id % 4 = 1 THEN strptime(strftime(ts, '%Y-%m-%dT%H:%M'), '%Y-%m-%dT%H:%M')
      |    WHEN event_id % 4 = 2 THEN strptime(strftime(ts, '%Y-%m-%d'), '%Y-%m-%d')
      |    ELSE strptime(strftime(ts, '%Y-%m'), '%Y-%m') END,
      |  '%Y-%m-%d %H:%M:%S') AS parsed
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- q140
  // Data-quality constraint suite (S4's precondition assert generalized
  // to data-shape contracts): null/range/domain/uniqueness/referential
  // checks over lineitem, all non-referential checks in ONE scan. The
  // range and domain thresholds are chosen to produce real violations so
  // the violation census (not just all-pass booleans) is under oracle.
  private def q140(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Validation
    import graft.ops.Validation._
    Validation.report(Tables.lineitem(s, d), Seq(
      NotNull("l_orderkey"),
      Unique(Seq("l_orderkey", "l_linenumber")),
      InRange("l_quantity", 1, 50),
      InRange("l_discount", 0.0, 0.08),
      Accepted("l_returnflag", Seq("A", "N")),
      RefIntegrity("l_orderkey", Tables.orders(s, d), "o_orderkey")))
      .orderBy("check")
  }
  private val q140Sql =
    """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem),
      |r AS (
      |  SELECT 'not_null(l_orderkey)' AS "check", n_rows,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
      |      AS n_violations FROM n
      |  UNION ALL
      |  SELECT 'unique(l_orderkey,l_linenumber)', n_rows,
      |    n_rows - (SELECT COUNT(DISTINCT (l_orderkey, l_linenumber))
      |              FROM lineitem) FROM n
      |  UNION ALL
      |  SELECT 'in_range(l_quantity)', n_rows,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NOT NULL
      |       AND NOT (l_quantity >= 1 AND l_quantity <= 50)) FROM n
      |  UNION ALL
      |  SELECT 'in_range(l_discount)', n_rows,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_discount IS NOT NULL
      |       AND NOT (l_discount >= 0.0 AND l_discount <= 0.08)) FROM n
      |  UNION ALL
      |  SELECT 'accepted(l_returnflag)', n_rows,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NOT NULL
      |       AND l_returnflag NOT IN ('A', 'N')) FROM n
      |  UNION ALL
      |  SELECT 'ref_integrity(l_orderkey)', n_rows,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
      |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) FROM n)
      |SELECT "check", n_rows, CAST(n_violations AS BIGINT) AS n_violations,
      |  n_violations = 0 AS passed
      |FROM r ORDER BY "check"""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q30_eav_unpivot", q30, Some(q30Sql)),
    QueryDef("q31_eav_pivot", q31, Some(q31Sql)),
    QueryDef("q32_phi_filter", q32, Some(q32Sql)),
    QueryDef("q33_date_shift", q33, Some(q33Sql)),
    QueryDef("q34_checkbox_array", q34, Some(q34Sql)),
    QueryDef("q35_dictionary_upsert", q35, Some(q35Sql)),
    QueryDef("q36_unknown_fields", q36, Some(q36Sql)),
    QueryDef("q37_lenient_dates", q37, Some(q37Sql)),
    QueryDef("q140_data_quality", q140, Some(q140Sql)),
  )
}
