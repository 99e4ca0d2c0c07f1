package graft.etl

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.time.LocalDate

/** Property-based invariants (SURVEY.md §5 item 4), driven through Spark so
  * the actual engine code paths are exercised, with ScalaCheck-generated
  * inputs sampled under fixed seeds (each case runs real Spark jobs, so a
  * bounded deterministic sample beats the scalatestplus driver here). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(42L + i)))

  private def forAllSampled[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit = {
    val cases = samples(g, n)
    assert(cases.nonEmpty, "generator produced no cases")
    cases.foreach(body)
  }

  private val fieldMap = Seq(("d", "TransformDate")).toDF("field_name", "status")

  private val dateGen: Gen[LocalDate] = for {
    epochDay <- Gen.choose(LocalDate.of(1940, 1, 1).toEpochDay,
      LocalDate.of(2030, 12, 31).toEpochDay)
  } yield LocalDate.ofEpochDay(epochDay)

  test("property: dobShift preserves pairwise day deltas for arbitrary date sets") {
    forAllSampled(Gen.zip(Gen.nonEmptyListOf(dateGen).map(_.distinct.take(6)), dateGen)) {
      case (dates: List[LocalDate], dob: LocalDate) =>
        if (dates.nonEmpty) {
          val rows = ("r", "np_dob", dob.toString) ::
            dates.zipWithIndex.map { case (dt, i) => (s"r", "d", dt.toString) }
          val eav = rows.toDF("record_id", "field_name", "value")
            .selectExpr("record_id", "'' AS redcap_event_name",
              "'' AS redcap_repeat_instrument", "'' AS redcap_repeat_instance",
              "field_name", "value",
              "CAST(NULL AS BOOLEAN) AS kpmp_date_cleaned",
              "CAST(NULL AS STRING) AS kpmp_date_cleaned_type")
          val out = DateShift.dobShift(eav, fieldMap, "2010-01-01").eav
            .filter("field_name = 'd'").select("value").as[String]
            .collect().map(LocalDate.parse).sortBy(_.toEpochDay)
          val in = dates.map(_.toString).distinct.map(LocalDate.parse).sortBy(_.toEpochDay)
          val deltasOut = out.sliding(2).filter(_.length == 2).map(p => p(1).toEpochDay - p(0).toEpochDay).toList
          val deltasIn = in.sliding(2).filter(_.length == 2).map(p => p(1).toEpochDay - p(0).toEpochDay).toList
          assert(deltasOut == deltasIn)
          // year-granularity shape: shifted values still render as dates
          assert(out.forall(_.getYear > 1900))
        }
    }
  }

  test("property: pivot ∘ unpivot = identity on key-unique wide frames") {
    val cellGen = Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)
    forAllSampled(Gen.zip(Gen.listOfN(4, cellGen), Gen.listOfN(4, cellGen)), n = 5) {
      case (r1: List[String], r2: List[String]) =>
        val wide = Seq(
          ("k1", r1(0), r1(1), r1(2), r1(3)),
          ("k2", r2(0), r2(1), r2(2), r2(3))).toDF("record_id", "a", "b", "c", "d")
        val eav = Reshape.unpivotWide(wide, "record_id", Seq("a", "b", "c", "d"))
        val back = Reshape.pivotEav(eav, values = Seq("a", "b", "c", "d"))
          .orderBy("record_id")
        assert(back.collect().map(_.toSeq).toSeq ==
          wide.orderBy("record_id").collect().map(_.toSeq).toSeq)
    }
  }

  test("property: PHI filter output ⊆ input and is deterministic") {
    val fm = Seq(("f1", "Include", null), ("f2", "Exclude", null))
      .toDF("field_name", "status", "restrict_to_event_list")
    forAllSampled(Gen.listOf(Gen.zip(Gen.oneOf("f1", "f2", "f3"), Gen.alphaStr.map(_.take(5)))), n = 5) {
      case (rows: List[(String, String)]) =>
        val eav = (("seed", "x") :: rows).toDF("field_name", "value")
          .selectExpr("'r' AS record_id", "'' AS redcap_event_name",
            "'' AS redcap_repeat_instrument", "'' AS redcap_repeat_instance",
            "field_name", "value",
            "CAST(NULL AS BOOLEAN) AS kpmp_date_cleaned",
            "CAST(NULL AS STRING) AS kpmp_date_cleaned_type")
        val kept = PhiFilter(eav, fm).kept
        assert(kept.count() <= eav.count())
        assert(kept.filter("field_name IN ('f2','f3','seed','x')").count() == 0)
    }
  }

  test("property: fingerprint is whitespace/case-normalization-invariant") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)))
    forAllSampled(wordGen, n = 5) { (words: List[String]) =>
      val canonical = words.mkString(" ")
      val noisy = "  " + words.mkString("   ").toUpperCase + " "
      val fps = Seq(canonical, noisy).toDF("text")
        .select(TextAnalysis.fingerprint($"text")).as[Long].collect()
      assert(fps(0) == fps(1))
    }
  }
}
