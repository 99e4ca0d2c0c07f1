package graft.etl

import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivot∘unpivot = identity on key-unique input") {
    val wide = Seq(
      ("r1", "34", "F"),
      ("r2", "55", "M")).toDF("record_id", "age", "sex")
    val eav = Reshape.unpivotWide(wide, "record_id", Seq("age", "sex"))
    assert(eav.count() == 4)
    val back = Reshape.pivotEav(eav, values = Seq("age", "sex"))
    val rows = back.orderBy("record_id").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("r1", "34", "F"), ("r2", "55", "M")))
  }

  test("unpivot emits one row per record×column with string values") {
    val wide = Seq(("r1", 1, 2.5)).toDF("record_id", "a", "b")
    val eav = Reshape.unpivotWide(wide, "record_id", Seq("a", "b"))
    val m = eav.as[(String, String, String)].collect()
      .map { case (_, f, v) => f -> v }.toMap
    assert(m == Map("a" -> "1", "b" -> "2.5"))
  }

  test("checkbox one-hot → sorted array of selected codes; blanks = 0") {
    val df = Seq(
      ("r1", "1", "0", "1"),
      ("r2", "0", "",  "0"),
      ("r3", "",  "1", "")).toDF("study_id", "race___1", "race___3", "race___8")
    val out = Reshape.checkboxToArray(df, "race", "race_codes")
    val m = out.select("study_id", "race_codes").as[(String, Seq[Int])]
      .collect().toMap
    assert(m("r1") == Seq(1, 8))
    assert(m("r2") == Seq())
    assert(m("r3") == Seq(3))
    assert(!out.columns.exists(_.startsWith("race___")))
  }

  test("checkbox code 0 is a legal selected code; non-numeric suffixes survive") {
    val df = Seq(("r1", "1", "1", "x")).toDF("study_id", "opt___0", "opt___2", "opt___note")
    val out = Reshape.checkboxToArray(df, "opt", "codes")
    val m = out.select("study_id", "codes").as[(String, Seq[Int])].collect().toMap
    assert(m("r1") == Seq(0, 2)) // code 0 must not vanish
    assert(out.columns.contains("opt___note")) // untouched, no crash
  }
}
