package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions.{count, countDistinct, lit, max, min}

class EavSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture: String = {
    val dir = Files.createTempDirectory("eav").toFile
    val f = new java.io.File(dir, "records.csv")
    val rows = (1 to 250).flatMap { r =>
      Seq(
        s"r$r,screening_arm_1,,,age,${20 + r % 60}",
        s"r$r,screening_arm_1,,,np_dob,1990-01-0${r % 9 + 1}",
        s"r$r,followup_arm_1,,,visit_date,2001-06-15")
    }
    val w = new java.io.PrintWriter(f)
    w.println("record_id,redcap_event_name,redcap_repeat_instrument,redcap_repeat_instance,field_name,value")
    rows.foreach(w.println); w.close()
    f.getAbsolutePath
  }

  private def read = spark.read.format("graft-eav")
    .option("path", fixture).option("chunk_size", 100)

  test("reads EAV rows with declared schema, one partition per id chunk") {
    val df = read.load()
    assert(df.schema == EavSource.schema)
    assert(df.count() == 750)
    assert(df.rdd.getNumPartitions == 3) // 250 ids / 100-id chunks
  }

  test("filter pushdown: field_name equality lands in PushedFilters") {
    val df = read.load().filter($"field_name" === "age")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("field_name"))
    assert(df.count() == 250)
    assert(df.select("value").as[String].collect().forall(v => v.toInt >= 20))
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = read.load().select("record_id", "value")
    assert(df.queryExecution.executedPlan.toString.contains("ReadSchema"))
    assert(df.schema.fieldNames.toSeq == Seq("record_id", "value"))
    assert(df.count() == 750)
  }

  test("residual filters still apply Spark-side (non-pushable predicate)") {
    val df = read.load().filter($"value".contains("1990"))
    assert(df.count() == 250) // only np_dob rows
  }

  test("limit pushdown: per-chunk cap in the scan, global limit still exact") {
    val df = read.load().limit(7)
    assert(df.queryExecution.executedPlan.toString.contains("PushedLimit: 7"))
    assert(df.count() == 7)
    // pushed limit composes with pushed filters (both inside the fetch)
    val filtered = read.load().filter($"field_name" === "age").limit(5)
    assert(filtered.count() == 5)
    assert(filtered.select("field_name").as[String].collect().forall(_ == "age"))
  }

  test("top-n pushdown: ORDER BY + LIMIT lands in the scan, result exact") {
    val df = read.load().orderBy($"record_id".desc, $"field_name").limit(6)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN") && plan.contains("record_id DESC"),
      s"no pushed top-n in: $plan")
    // exact equality with the unpushed formulation (binary string order)
    val exp = read.load().collect()
      .map(r => (r.getString(0), r.getString(4), r.getString(5)))
      .sortBy { case (rid, fn, _) => (rid, fn) }(
        Ordering.Tuple2(Ordering[String].reverse, Ordering[String]))
      .take(6).toSeq
    val got = df.collect().map(r => (r.getString(0), r.getString(4), r.getString(5))).toSeq
    assert(got == exp)
  }

  test("top-n pushdown declines under residual filters (correctness guard)") {
    val df = read.load().filter($"value".contains("1990"))
      .orderBy($"record_id").limit(4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedTopN: [record_id"), s"unsafe push in: $plan")
    assert(df.count() == 4)
    assert(df.select("field_name").as[String].collect().forall(_ == "np_dob"))
  }

  test("aggregate pushdown: per-chunk partial group-by lands in the scan, " +
      "final aggregate still exact") {
    val df = read.load().groupBy($"field_name")
      .agg(count(lit(1)).as("n"), min($"value").as("mn"), max($"value").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), s"no pushed aggregation in: $plan")
    val got = df.as[(String, Long, String, String)].collect().toSet
    // oracle: same CSV through the plain text reader
    val raw = spark.read.option("header", true).csv(fixture)
    val exp = raw.groupBy($"field_name")
      .agg(count(lit(1)).as("n"), min($"value").as("mn"), max($"value").as("mx"))
      .as[(String, Long, String, String)].collect().toSet
    assert(got == exp && got.size == 3)
    // composes with pushed filters (filter applied before the per-chunk agg)
    val filtered = read.load().filter($"field_name" === "age")
      .groupBy($"redcap_event_name").agg(count(lit(1)).as("n"))
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(filtered.as[(String, Long)].collect().toSeq == Seq(("screening_arm_1", 250L)))
  }

  test("aggregate pushdown declines: distinct counts and residual filters") {
    val distinctAgg = read.load().groupBy($"field_name")
      .agg(countDistinct($"record_id").as("n"))
    assert(!distinctAgg.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(distinctAgg.as[(String, Long)].collect().toMap ==
      Map("age" -> 250L, "np_dob" -> 250L, "visit_date" -> 250L))
    val residual = read.load().filter($"value".contains("1990"))
      .groupBy($"field_name").agg(count(lit(1)).as("n"))
    assert(!residual.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(residual.as[(String, Long)].collect().toMap == Map("np_dob" -> 250L))
  }

  test("columnar read path: plain scans vectorize (ColumnarToRow in plan), " +
      "values identical to the row reader") {
    val df = read.load()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"scan not vectorized: ${plan.take(600)}")
    assert(df.count() == 750)
    // values identical to the plain CSV reader (same column set + content)
    // (csv reads blank as null; the EAV plane carries empty strings)
    val viaCsv = spark.read.option("header", true).csv(fixture)
      .na.fill("").collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == viaCsv)
    // filter + pruning still vectorized; limit/top-n fall back to rows
    val filtered = read.load().filter($"field_name" === "age").select("record_id", "value")
    assert(filtered.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(filtered.count() == 250)
    val limited = read.load().limit(7)
    assert(!limited.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(limited.count() == 7)
  }

  test("table-sample pushdown: Sample evaluated inside the fetch, " +
      "deterministic, roughly proportional") {
    val df = read.load().sample(0.3, seed = 17)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedSample: [0.0, 0.3)"), s"no pushed sample in: $plan")
    assert(!plan.contains("Sample "), s"Sample operator survived the push: $plan")
    val n1 = df.count()
    assert(n1 > 750 * 0.15 && n1 < 750 * 0.45, s"got $n1 of 750")
    // content-keyed: identical result on every run, any plan shape
    assert(read.load().sample(0.3, seed = 17).count() == n1)
    val rows1 = df.collect().map(_.toSeq).toSet
    assert(read.load().sample(0.3, seed = 17).collect().map(_.toSeq).toSet == rows1)
    // sample-below-filter composes (the rule pushes a Sample only when the
    // scan is its direct child); the filter stays above, results correct
    val filtered = read.load().sample(0.5, seed = 3).filter($"field_name" === "age")
    val fPlan = filtered.queryExecution.executedPlan.toString
    assert(fPlan.contains("PushedSample: [0.0, 0.5)"), fPlan)
    val vals = filtered.select("field_name").as[String].collect()
    assert(vals.nonEmpty && vals.forall(_ == "age"))
  }

  test("micro-batch stream: chunked extraction over triggers with admission " +
      "control; appended ids picked up incrementally") {
    // private copy of the fixture so appends don't disturb other tests
    val dir = Files.createTempDirectory("eavstream").toFile
    val f = new java.io.File(dir, "records.csv")
    def writeRows(ids: Range, append: Boolean): Unit = {
      val w = new java.io.PrintWriter(new java.io.FileWriter(f, append))
      if (!append)
        w.println("record_id,redcap_event_name,redcap_repeat_instrument,redcap_repeat_instance,field_name,value")
      ids.foreach(r => w.println(s"r${"%03d".format(r)},screening_arm_1,,,age,${20 + r % 60}"))
      w.close()
    }
    writeRows(1 to 100, append = false)

    val ckpt = Files.createTempDirectory("eavck").toFile.getAbsolutePath
    val stream = spark.readStream.format("graft-eav")
      .option("path", f.getAbsolutePath)
      .option("chunk_size", 10)
      .option("max_chunks_per_trigger", 3)
      .load()
    val q = stream.writeStream.format("memory").queryName("eav_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("eav_stream").count() == 100)
    // admission control: 100 ids / 10-id chunks / 3 chunks per trigger -> >= 4 batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    val perBatch = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
    assert(perBatch.forall(_ <= 30), perBatch.mkString(","))

    // growing id universe: appended ids (sorting after existing) arrive
    // in later triggers without reprocessing old chunks
    writeRows(101 to 115, append = true)
    q.processAllAvailable(); q.stop()
    val got = spark.table("eav_stream")
    assert(got.count() == 115)
    assert(got.select("record_id").distinct().count() == 115)
  }

  test("micro-batch stream: filter pushdown applies inside the streaming fetch") {
    val ckpt = Files.createTempDirectory("eavck2").toFile.getAbsolutePath
    val stream = spark.readStream.format("graft-eav")
      .option("path", fixture).option("chunk_size", 100)
      .load()
      .filter($"field_name" === "age")
    val q = stream.writeStream.format("memory").queryName("eav_stream_f")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("eav_stream_f").count() == 250)
    assert(spark.table("eav_stream_f").select("field_name")
      .as[String].collect().forall(_ == "age"))
  }

  test("runtime filtering: selective broadcast join prunes whole chunk " +
      "fetches at execution (DSv2 dynamic pruning)") {
    // cohort table on disk so the selective predicate survives as a Filter
    // node (a LocalRelation would constant-fold it away and DPP needs a
    // visible selective filter on the build side)
    val dimDir = Files.createTempDirectory("eavdim").resolve("cohort").toString
    (1 to 250).map(r => (s"r$r", if (r <= 3) "keep" else "drop"))
      .toDF("record_id", "cohort").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"cohort" === "keep")

    val fact = read.load() // 250 ids / 100-id chunks = 3 chunks
    val joined = fact.join(dim, "record_id")
    EavSource.chunkFetches.set(0L)
    val rows = joined.collect()
    assert(rows.length == 9, s"expected 3 ids x 3 rows, got ${rows.length}")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [") && !plan.contains("RuntimeFilters: []"),
      s"no runtime filter on the scan: ${plan.take(800)}")
    // r1,r2,r3 all sort into the first id chunk -> 1 fetch instead of 3:
    // at scale, 2 of 3 REST requests were never issued
    assert(EavSource.chunkFetches.get() == 1L,
      s"expected 1 chunk fetch, got ${EavSource.chunkFetches.get()}")

    // without a runtime-filterable join, all 3 chunks fetch
    EavSource.chunkFetches.set(0L)
    assert(fact.count() == 750)
    assert(EavSource.chunkFetches.get() == 3L)
  }

  test("reported statistics let Catalyst broadcast a small extraction") {
    // big probe side (parquet, beyond broadcast threshold is irrelevant —
    // what matters is the SMALL side is the v2 scan, which without
    // SupportsReportStatistics would report "huge" and force a shuffle)
    val dimDir = Files.createTempDirectory("eavstats").resolve("users").toString
    (1 to 250).flatMap(r => (1 to 40).map(i => (s"r$r", i)))
      .toDF("record_id", "i").write.parquet(dimDir)
    val big = spark.read.parquet(dimDir)
    val joined = big.join(read.load().filter($"field_name" === "age"), "record_id")
    assert(joined.count() == 250L * 40)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in: ${plan.take(600)}")
    // the estimate itself (not AQE) makes the scan broadcastable: the v2
    // relation must report the transport size, not the "assume huge" default
    val v2Stats = joined.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats.sizeInBytes
    }
    assert(v2Stats.nonEmpty && v2Stats.head < BigInt(1000000),
      s"v2 scan stats not reported: $v2Stats")
  }

  test("feeds the ETL pipeline end-to-end") {
    val fm = Seq(("age", "Include", null.asInstanceOf[String]),
      ("visit_date", "TransformDate", null.asInstanceOf[String]),
      ("np_dob", "Exclude", null.asInstanceOf[String]))
      .toDF("field_name", "status", "restrict_to_event_list")
    val eav = read.load()
      .withColumn("kpmp_date_cleaned", org.apache.spark.sql.functions.lit(null).cast("boolean"))
      .withColumn("kpmp_date_cleaned_type", org.apache.spark.sql.functions.lit(null).cast("string"))
    val out = graft.etl.Pipeline.run(eav, fm, Seq(
      new graft.etl.DateShiftTransform(fm, "dob_shifting", standardDate = "2010-01-01")))
    // every record has a dob → every visit_date cleaned and kept; + all ages
    assert(out.kept.filter("field_name = 'visit_date'").count() == 250)
    assert(out.kept.filter("field_name = 'age'").count() == 250)
    assert(out.kept.filter("field_name = 'np_dob'").count() == 0)
  }
}
