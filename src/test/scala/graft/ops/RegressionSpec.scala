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

  test("corrPairs: perfect/anti/zero-variance correlations; one pass") {
    val df = Seq(
      // y = 2x (corr 1), z = -x + 10 (corr -1 with x), w constant
      (1L, 2L, 9L, 5L), (2L, 4L, 8L, 5L), (3L, 6L, 7L, 5L), (4L, 8L, 6L, 5L))
      .toDF("x", "y", "z", "w")
    val got = Regression.corrPairs(df, Nil,
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z"),
        "w" -> col("w")))
      .orderBy("var_x", "var_y")
      .select("var_x", "var_y", "corr").collect()
    val byPair = got.map(r =>
      (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // ±1 up to sqrt-rounding ulps (the contract is cross-engine
    // bit-identity of the fixed double op tree, not algebraic exactness)
    assert(math.abs(byPair(("x", "y")).get - 1.0) < 1e-12)
    assert(math.abs(byPair(("x", "z")).get + 1.0) < 1e-12)
    assert(math.abs(byPair(("y", "z")).get + 1.0) < 1e-12)
    assert(byPair(("x", "w")) == None) // zero variance → null
    assert(got.length == 6)
    // single aggregation pass: exactly one Aggregate above the scan
    val plan = Regression.corrPairs(df, Nil,
      Seq("x" -> col("x"), "y" -> col("y"))).queryExecution.optimizedPlan
    val nAgg = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAgg == 1)
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

  /** Local replica of the batch perceptron recurrence (the ≤0 update rule,
    * synchronous rounds) — the spec's oracle. */
  private def localPerceptron(rows: Seq[(Long, Seq[Long])], rounds: Int)
      : (Long, Seq[Long]) = {
    val k = rows.head._2.size
    var b = 0L
    var w = Seq.fill(k)(0L)
    for (_ <- 1 to rounds) {
      val mis = rows.filter { case (y, x) =>
        y * (b + w.zip(x).map { case (a, v) => a * v }.sum) <= 0
      }
      b += mis.map(_._1).sum
      w = w.zipWithIndex.map { case (a, i) =>
        a + mis.map { case (y, x) => y * x(i) }.sum
      }
    }
    (b, w)
  }

  test("perceptronTrain ≡ local batch replica; first round folds in every " +
      "example; converged data stops updating; exact confusion counts") {
    // linearly separable on x1: y = +1 iff x1 > 4 (x2 is a decoy)
    val rows = Seq(
      (1L, Seq(9L, 1L)), (1L, Seq(7L, 5L)), (1L, Seq(6L, 2L)),
      (-1L, Seq(1L, 4L)), (-1L, Seq(2L, 1L)), (-1L, Seq(3L, 5L)))
    val df = rows.map { case (y, x) => (y, x(0), x(1)) }.toDF("y", "x1", "x2")
    val got3 = Regression.perceptronTrain(df, Seq(col("x1"), col("x2")),
      col("y"), rounds = 3).head()
    val (b3, w3) = localPerceptron(rows, 3)
    assert(got3.getLong(0) == 6L) // n_train
    assert(got3.getLong(1) == b3)
    assert(got3.getLong(2) == w3(0) && got3.getLong(3) == w3(1))
    // confusion under the final weights, recomputed locally
    val preds = rows.map { case (y, x) =>
      (y, b3 + w3.zip(x).map { case (a, v) => a * v }.sum > 0)
    }
    assert(got3.getLong(4) == preds.count { case (y, p) => y == 1 && p })
    assert(got3.getLong(5) == preds.count { case (y, p) => y == -1 && p })
    assert(got3.getLong(6) == preds.count { case (y, p) => y == -1 && !p })
    assert(got3.getLong(7) == preds.count { case (y, p) => y == 1 && !p })
    // once every margin is strictly positive, extra rounds are no-ops
    val (b9, w9) = localPerceptron(rows, 9)
    if ((b9, w9) == ((b3, w3))) {
      val got9 = Regression.perceptronTrain(df, Seq(col("x1"), col("x2")),
        col("y"), rounds = 9).head()
      assert(got9.getLong(1) == b3 && got9.getLong(2) == w3(0))
    }
    // round 1 from zero weights treats EVERY example as misclassified
    val got1 = Regression.perceptronTrain(df, Seq(col("x1"), col("x2")),
      col("y"), rounds = 1).head()
    assert(got1.getLong(1) == rows.map(_._1).sum)
    assert(got1.getLong(2) == rows.map { case (y, x) => y * x(0) }.sum)
  }

  test("perceptronTrain: layout invariance and the ±1 label contract") {
    val rows = (1L to 40L).map(i =>
      (if (i % 3 == 0) 1L else -1L, i % 7, (i * i) % 11))
    val df = rows.toDF("y", "x1", "x2")
    val a = Regression.perceptronTrain(df, Seq(col("x1"), col("x2")),
      col("y"), rounds = 4).head()
    val b = Regression.perceptronTrain(df.repartition(13),
      Seq(col("x1"), col("x2")), col("y"), rounds = 4).head()
    assert(a == b, "batch updates must be partition-layout-invariant")
    val bad = Seq((0L, 1L, 1L)).toDF("y", "x1", "x2")
    val err = intercept[Exception] {
      Regression.perceptronTrain(bad, Seq(col("x1"), col("x2")),
        col("y"), rounds = 1).collect()
    }
    assert(err.getMessage.contains("label must be +1 or -1"))
  }

  test("trendFit: (Σx)²-class closing products past int64 stay exact " +
      "(the zipfFit ln·1e6 regime — int64 would wrap silently)") {
    // x ~ 1.5e9: every SUM fits int64 (Σx² = 7.7e18 < 2^63) but the
    // closing products n·Σx² = 2.31e19 and (Σx)² = 2.304e19 both
    // overflow int64 — the decimal(38,0) close must yield the exact
    // den = 6e16, num = 6e8 → slope exactly 1e-8, intercept exactly 0
    val df = Seq((1500000000L, 15L), (1600000000L, 16L), (1700000000L, 17L))
      .toDF("x", "y")
    val got = Regression.trendFit(df, Nil, col("x"), col("y")).collect().head
    assert(got.getAs[Double]("slope") == 1e-8, s"got $got")
    assert(got.getAs[Double]("intercept") == 0.0, s"got $got")
  }

  test("perceptronTrain: NULL feature fails loudly (would otherwise " +
      "silently drop the row from updates and confusion while counting " +
      "in n_train)") {
    val df = Seq((1L, Some(2L), 3L), (-1L, None, 4L))
      .toDF("y", "x1", "x2")
    val err = intercept[Exception] {
      Regression.perceptronTrain(df, Seq(col("x1"), col("x2")), col("y"),
        rounds = 1).collect()
    }
    assert(err.getMessage.contains("feature 1 is NULL"), err.getMessage)
  }
}
