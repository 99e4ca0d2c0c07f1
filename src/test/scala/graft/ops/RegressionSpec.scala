package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("trendFit: hand-computed slope/intercept per group; zero-variance null") {
    val df = Seq(
      // group a: y = 3x + 10 exactly
      ("a", 0L, 10L), ("a", 1L, 13L), ("a", 2L, 16L), ("a", 3L, 19L),
      // group b: y = -2x + 5 with symmetric noise (+1, -1) → same fit
      ("b", 0L, 6L), ("b", 2L, 0L), ("b", 4L, -2L), ("b", 6L, -8L),
      // group c: single distinct x → zero variance → null fit
      ("c", 7L, 1L), ("c", 7L, 9L))
      .toDF("g", "x", "y")
    val got = Regression.trendFit(df, Seq("g"), col("x"), col("y"))
      .orderBy("g")
      .select("g", "n", "slope", "intercept")
      .collect()

    assert(got(0).getString(0) == "a" && got(0).getLong(1) == 4L)
    assert(got(0).getDouble(2) == 3.0 && got(0).getDouble(3) == 10.0)

    // group b by hand: n=4 sx=12 sy=-4 sxy=(0+0-8-48)=-56 sxx=56
    // num = 4*(-56) - 12*(-4) = -176; den = 4*56 - 144 = 80
    // slope = -2.2; intercept = (-4 - (-2.2)*12)/4 = 5.6
    assert(got(1).getString(0) == "b" && got(1).getLong(1) == 4L)
    assert(math.abs(got(1).getDouble(2) - (-2.2)) < 1e-12)
    assert(math.abs(got(1).getDouble(3) - 5.6) < 1e-12)

    assert(got(2).getString(0) == "c" && got(2).getLong(1) == 2L)
    assert(got(2).isNullAt(2) && got(2).isNullAt(3))
  }

  test("trendFit: partition-count invariant (exact integer statistics)") {
    val base = (0 until 1000).map { i =>
      ("k" + (i % 7), (i % 101).toLong - 50L, (i * 37 % 997).toLong - 400L)
    }
    val df1 = base.toDF("g", "x", "y").repartition(1)
    val dfN = base.toDF("g", "x", "y").repartition(13)
    val a = Regression.trendFit(df1, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect().toSeq
    val b = Regression.trendFit(dfN, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect().toSeq
    assert(a == b) // bit-identical: sums are exact longs, divisions correctly rounded
  }
}
