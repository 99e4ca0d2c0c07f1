package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden end-to-end (SURVEY.md §5 item 2): the §7.1 minimum slice over a
  * fixed fixture, rendered as canonical sorted NDJSON and compared line by
  * line against the checked-in golden — mechanizing the reference's
  * `--fake` dry-run harness. Regenerate with `printGolden` below if the
  * contract intentionally changes. */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goldenPath = "src/test/resources/golden/minimum_slice.ndjson"

  private def run(): Seq[String] = {
    val fieldMap = Seq(
      ("age",        "Include",       null),
      ("site",       "Include",       "screening_arm_1"),
      ("visit_date", "TransformDate", null),
      ("visit_ts",   "TransformDateTimeSeconds", null),
      ("ssn",        "Exclude",       null),
      ("np_dob",     "Exclude",       null)
    ).toDF("field_name", "status", "restrict_to_event_list")
    val eav = Seq(
      ("r1", "screening_arm_1", "np_dob",     "1990-05-20"),
      ("r1", "screening_arm_1", "age",        "34"),
      ("r1", "screening_arm_1", "site",       "site-07"),
      ("r1", "followup_arm_1",  "site",       "site-07"),   // event-restricted → drop
      ("r1", "screening_arm_1", "visit_date", "2001-06-15"),
      ("r1", "screening_arm_1", "visit_ts",   "2001-06-15T10:30:45"),
      ("r1", "screening_arm_1", "ssn",        "123-45-6789"),
      ("r1", "screening_arm_1", "demo_complete", "2"),
      ("r1", "screening_arm_1", "mystery",    "x"),
      ("r2", "screening_arm_1", "age",        "55"),
      ("r2", "screening_arm_1", "visit_date", "2002-01-01") // no dob → fail closed
    ).toDF("record_id", "redcap_event_name", "field_name", "value")
      .selectExpr("record_id", "redcap_event_name",
        "'' AS redcap_repeat_instrument", "'' AS redcap_repeat_instance",
        "field_name", "value",
        "CAST(NULL AS BOOLEAN) AS kpmp_date_cleaned",
        "CAST(NULL AS STRING) AS kpmp_date_cleaned_type")
    val deid = Seq(("r1", "4", "White")).toDF("study_id", "exp_age_decade", "exp_race")
    val mapping = Seq(("r1", "S-001")).toDF("redcap_record_id", "secondary_id")

    val result = Pipeline.run(eav, fieldMap, Seq(
      new DateShiftTransform(fieldMap, "dob_shifting", standardDate = "2010-01-01"),
      new CalcVariableTransform(deid),
      new SecondaryIdTransform(mapping)))

    val keptJson = result.kept
      .orderBy("record_id", "field_name", "redcap_event_name")
      .select(to_json(struct(col("record_id"), col("redcap_event_name"),
        col("field_name"), col("value"), col("kpmp_date_cleaned"),
        col("kpmp_date_cleaned_type"))).as("j"))
      .as[String].collect().toSeq
    val trJson = result.transformRecords.get
      .orderBy("namespace", "record_id", "field_name")
      .select(to_json(struct(col("record_id"), col("namespace"),
        col("field_name"), col("field_value"))).as("j"))
      .as[String].collect().toSeq
    keptJson ++ ("---" +: trJson)
  }

  test("minimum slice matches the checked-in golden NDJSON") {
    val got = run()
    val golden = scala.io.Source.fromFile(goldenPath).getLines().toSeq
    assert(got == golden,
      s"\n=== got ===\n${got.mkString("\n")}\n=== golden ===\n${golden.mkString("\n")}")
  }
}
