package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Truth table for the PHI rule cascade (SURVEY.md §5 item 1; semantics from
  * /root/reference/redcap-etl.py:299-356). Asserts the DROP cases as hard as
  * the keeps — fail-closed is the contract. */
class PhiFilterSpec extends SparkSpec {
  import spark.implicits._

  private def eav(rows: (String, String, String, Option[Boolean])*): DataFrame =
    rows.toSeq.toDF("record_id", "redcap_event_name", "field_name", "__cleaned")
      .selectExpr("record_id", "redcap_event_name",
        "'' AS redcap_repeat_instrument", "'' AS redcap_repeat_instance",
        "field_name", "'v' AS value",
        "__cleaned AS kpmp_date_cleaned",
        "CAST(NULL AS STRING) AS kpmp_date_cleaned_type")

  private val fieldMap = Seq(
    ("age",        "Include",           null),
    ("site",       "Include",           "screening_arm_1, followup_arm_1"),
    ("visit_date", "TransformDate",     null),
    ("dob",        "TransformDateYear", null),
    ("ssn",        "Exclude",           null),
    ("note",       null,                null)
  ).toDF("field_name", "status", "restrict_to_event_list")

  private def run(rows: (String, String, String, Option[Boolean])*): (Set[String], Set[String]) = {
    val r = PhiFilter(eav(rows: _*), fieldMap)
    (r.kept.select("field_name").as[String].collect().toSet,
     r.unknownFields.as[String].collect().toSet)
  }

  test("data-access-group and _complete rows always pass") {
    val (kept, unknown) = run(
      ("r1", "screening_arm_1", "redcap_data_access_group", None),
      ("r1", "screening_arm_1", "demographics_complete", None))
    assert(kept == Set("redcap_data_access_group", "demographics_complete"))
    assert(unknown.isEmpty)
  }

  test("Include passes; Exclude and null-status drop") {
    val (kept, _) = run(
      ("r1", "screening_arm_1", "age", None),
      ("r1", "screening_arm_1", "ssn", None),
      ("r1", "screening_arm_1", "note", None))
    assert(kept == Set("age"))
  }

  test("event restriction: only listed events pass") {
    val (kept, _) = run(
      ("r1", "screening_arm_1", "site", None),
      ("r2", "followup_arm_1", "site", None),
      ("r3", "other_arm_1", "site", None))
    assert(kept == Set("site"))
    val r = PhiFilter(eav(
      ("r1", "screening_arm_1", "site", None),
      ("r3", "other_arm_1", "site", None)), fieldMap)
    assert(r.kept.select("record_id").as[String].collect().toSet == Set("r1"))
  }

  test("date rows pass only when cleaned — fail-closed") {
    val (kept, _) = run(
      ("r1", "screening_arm_1", "visit_date", Some(true)),
      ("r2", "screening_arm_1", "visit_date", None),
      ("r3", "screening_arm_1", "dob", Some(false)))
    val r = PhiFilter(eav(
      ("r1", "screening_arm_1", "visit_date", Some(true)),
      ("r2", "screening_arm_1", "visit_date", None)), fieldMap)
    assert(r.kept.select("record_id").as[String].collect().toSet == Set("r1"))
    assert(kept == Set("visit_date"))
  }

  test("unknown fields drop and report once") {
    val (kept, unknown) = run(
      ("r1", "screening_arm_1", "mystery", None),
      ("r2", "screening_arm_1", "mystery", None),
      ("r1", "screening_arm_1", "age", None))
    assert(kept == Set("age"))
    assert(unknown == Set("mystery"))
  }

  test("duplicate field-map rows do not fan out kept rows") {
    val dupMap = Seq(
      ("age", "Include", null),
      ("age", "Include", null)
    ).toDF("field_name", "status", "restrict_to_event_list")
    val r = PhiFilter(eav(("r1", "screening_arm_1", "age", None)), dupMap)
    assert(r.kept.count() == 1)
  }

  test("output is a subset of input (monotonicity)") {
    val in = eav(
      ("r1", "screening_arm_1", "age", None),
      ("r1", "screening_arm_1", "ssn", None),
      ("r1", "x", "site", None))
    val r = PhiFilter(in, fieldMap)
    assert(r.kept.count() <= in.count())
    assert(r.kept.columns.toSeq == in.columns.toSeq)
  }
}
