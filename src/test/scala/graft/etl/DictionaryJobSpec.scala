package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class DictionaryJobSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("dict").toFile

  private def writeMeta(): String = {
    val f = new java.io.File(dir, "metadata.json")
    val json =
      """[{"field_name":"age","form_name":"demo","field_type":"text","field_label":"Age","select_choices_or_calculations":null,"text_validation_type_or_show_slider_number":"number","section_header":null},
        |{"field_name":"np_dob","form_name":"demo","field_type":"text","field_label":"DOB","select_choices_or_calculations":null,"text_validation_type_or_show_slider_number":"date_ymd","section_header":null}]""".stripMargin
    Files.writeString(f.toPath, json)
    f.getAbsolutePath
  }

  private def writeExisting(): String = {
    val f = new java.io.File(dir, "existing.csv")
    Files.writeString(f.toPath,
      """field_name,status,notes
        |age,Include,curated by hand
        |gone_field,Exclude,no longer in redcap
        |""".stripMargin)
    f.getAbsolutePath
  }

  test("first run: fresh dictionary with empty curation columns, ordered") {
    val out = DictionaryJob.run(spark, writeMeta(), None,
      new java.io.File(dir, "out1").getAbsolutePath)
    assert(out.columns.toSeq == Model.fieldMapColumns)
    assert(out.count() == 2)
    assert(out.filter($"status".isNotNull).count() == 0)
  }

  test("re-run: curation survives, dropped fields vanish, new fields blank") {
    val out = DictionaryJob.run(spark, writeMeta(), Some(writeExisting()),
      new java.io.File(dir, "out2").getAbsolutePath)
    val m = out.select("field_name", "status", "notes")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("age") == ((Some("Include"), Some("curated by hand"))))
    assert(m("np_dob") == ((None, None)))
    assert(!m.contains("gone_field")) // update() adds no rows
  }

  test("project precondition fails fast on mismatch") {
    Preconditions.validateProject("42", Map("project_id" -> "42"))
    intercept[IllegalArgumentException] {
      Preconditions.validateProject("42", Map("project_id" -> "99"))
    }
  }
}
