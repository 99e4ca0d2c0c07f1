package graft.etl

import graft.SparkSpec

/** Upsert semantics per /root/reference/dictionary_extraction.py:84-103. */
class DictionaryMergeSpec extends SparkSpec {
  import spark.implicits._

  private val fresh = Seq(
    ("age",  null.asInstanceOf[String], "number", null.asInstanceOf[String]),
    ("site", null.asInstanceOf[String], "text",   null.asInstanceOf[String]),
    ("newf", null.asInstanceOf[String], "text",   null.asInstanceOf[String])
  ).toDF("field_name", "status", "field_type", "notes")

  private val existing = Seq(
    ("age",     "Include", "curated note"),
    ("site",    null.asInstanceOf[String], null.asInstanceOf[String]),
    ("dropped", "Exclude", "was removed upstream")
  ).toDF("field_name", "status", "notes")

  test("existing curation overwrites fresh; fresh-only rows keep nulls") {
    val out = DictionaryMerge.upsert(fresh, existing)
    val m = out.select("field_name", "status", "notes")
      .as[(String, Option[String], Option[String])].collect()
      .map { case (f, s, n) => f -> ((s, n)) }.toMap
    assert(m("age") == ((Some("Include"), Some("curated note"))))
    assert(m("site") == ((None, None)))
    assert(m("newf") == ((None, None)))
  }

  test("duplicate key in curated file does not fan out the fresh extraction") {
    val dupExisting = Seq(
      ("age", "Include", "first"),
      ("age", "Exclude", "second")
    ).toDF("field_name", "status", "notes")
    val out = DictionaryMerge.upsert(fresh, dupExisting)
    assert(out.count() == fresh.count())
    assert(out.filter("field_name = 'age'").count() == 1)
  }

  test("row universe = fresh only (update adds no rows); non-curated from fresh") {
    val out = DictionaryMerge.upsert(fresh, existing)
    assert(out.select("field_name").as[String].collect().toSet ==
      Set("age", "site", "newf"))
    assert(out.filter("field_name='age'").select("field_type")
      .as[String].head() == "number")
    assert(out.columns.toSeq == fresh.columns.toSeq)
  }
}
