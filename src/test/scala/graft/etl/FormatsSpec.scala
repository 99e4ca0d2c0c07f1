package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Source/sink format round-trips beyond parquet: ORC (columnar lake
  * alternate), CSV and NDJSON (the reference's interchange formats). Each
  * write must read back value-identical, and the columnar path must keep
  * filter pushdown — format coverage is only real if the scan still prunes. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("formats").toFile.getAbsolutePath
  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("ORC round-trip is value-identical and keeps predicate pushdown") {
    Sinks.orc(docs, s"$dir/docs_orc")
    val back = spark.read.orc(s"$dir/docs_orc")
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    val plan = back.filter($"doc_id" === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)"),
      s"ORC scan lost pushdown:\n$plan")
  }

  test("CSV round-trip with explicit schema is value-identical") {
    // escape-sensitive: doc text contains commas/quotes/newlines
    docs.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$dir/docs_csv")
    val back = spark.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(s"$dir/docs_csv")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("NDJSON round-trip is value-identical under explicit schema") {
    Sinks.ndjson(docs, s"$dir/docs_json",
      org.apache.spark.sql.SaveMode.Overwrite)
    val back = spark.read.schema(docs.schema).json(s"$dir/docs_json")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
