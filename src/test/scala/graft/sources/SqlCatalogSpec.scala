package graft.sources

import graft.SparkSpec

/** Pure-SQL drivability: `Tables.registerAll` exposes the test tables (and
  * the EAV connector) as catalog views, and existing engine queries return
  * identical results when written as `spark.sql` text — no DataFrame code
  * required from a SQL-only user. */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val eavFixture: String = {
    val d = java.nio.file.Files.createTempDirectory("eavsql").toFile
    val f = new java.io.File(d, "records.csv")
    val w = new java.io.PrintWriter(f)
    w.println("record_id,redcap_event_name,redcap_repeat_instrument,redcap_repeat_instance,field_name,value")
    (1 to 30).foreach { r =>
      w.println(s"r$r,screening_arm_1,,,age,${20 + r % 50}")
      w.println(s"r$r,screening_arm_1,,,np_dob,1990-01-0${r % 9 + 1}")
    }
    w.close()
    f.getAbsolutePath
  }

  test("registerAll: every test table is queryable via spark.sql") {
    Tables.registerAll(spark, dir, Some(eavFixture))
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, t)
    }
  }

  test("SQL face of q01 (pricing summary) ≡ the DataFrame query") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = graft.SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"count_order")
      .orderBy($"l_returnflag", $"l_linestatus")
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("SQL face of a join query: nation join over the views plans a broadcast") {
    Tables.registerAll(spark, dir)
    val df = spark.sql(
      """SELECT n.n_name, COUNT(*) AS n_cust
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
    assert(df.count() == 25)
    // the dimension side broadcasts — views don't hide the stats
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("the EAV connector participates in SQL with its pushdowns intact") {
    Tables.registerAll(spark, dir, Some(eavFixture))
    val df = spark.sql("SELECT record_id, value FROM eav WHERE field_name = 'age'")
    assert(df.count() == 30)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("field_name"))
  }
}
