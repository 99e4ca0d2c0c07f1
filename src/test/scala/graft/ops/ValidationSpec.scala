package graft.ops

import graft.SparkSpec

class ValidationSpec extends SparkSpec {
  import spark.implicits._
  import Validation._

  test("report: every check type counts its violations exactly") {
    val child = Seq(
      (Option(1L), "A", 5.0),
      (Option(1L), "A", 5.0),   // duplicate (k, s) pair
      (Option(2L), "B", -1.0),  // range violation
      (Option(9L), "X", 3.0),   // orphan key + bad domain value
      (Option.empty[Long], "A", 3.0)) // null key (NOT a range/ref violation)
      .toDF("k", "s", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Validation.report(child, Seq(
      NotNull("k"),
      Unique(Seq("k", "s")),
      InRange("v", 0.0, 10.0),
      Accepted("s", Seq("A", "B")),
      RefIntegrity("k", parent, "pk")))
      .orderBy("check")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("accepted(s)", 5L, 1L, false),
      ("in_range(v)", 5L, 1L, false),
      ("not_null(k)", 5L, 1L, false),
      ("ref_integrity(k)", 5L, 1L, false),
      ("unique(k,s)", 5L, 1L, false)), s"got $got")
  }

  test("report: all-clean table passes every check") {
    val df = Seq((1L, "A"), (2L, "B")).toDF("k", "s")
    val got = Validation.report(df, Seq(
      NotNull("k"), Unique(Seq("k")), Accepted("s", Seq("A", "B"))))
    assert(got.filter(!$"passed").count() == 0)
    assert(got.count() == 3)
  }
}
