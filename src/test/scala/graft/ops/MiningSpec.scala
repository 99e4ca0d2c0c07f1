package graft.ops

import graft.SparkSpec

class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: hand-computed supports, confidences and lift; " +
    "duplicate (basket, item) rows collapse") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{a} — duplicate (2,a) row must
    // not double-count; minPairSupport 2 drops (b,c) which co-occurs once
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "a"),
      (2L, "b"), (3L, "a"), (3L, "c"), (4L, "a")).toDF("b", "i")
    val got = Mining.pairRules(rows, "b", "i", minPairSupport = 2L)
      .select($"item_a", $"item_b", $"n_ab", $"n_a", $"n_b", $"n_baskets",
        $"conf_ab_e6", $"conf_ba_e6", $"lift_e6")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    // (a,b): 2/4 → conf_ab 500000, 2/2 → conf_ba 1000000,
    // lift 1e6·2·4/(4·2) = 1000000; (a,c) identical by symmetry
    assert(got == Set(
      ("a", "b", 2L, 4L, 2L, 4L, 500000L, 1000000L, 1000000L),
      ("a", "c", 2L, 4L, 2L, 4L, 500000L, 1000000L, 1000000L)))
  }

  test("pairRules: lift above/below 1e6 separates positive from negative " +
    "association") {
    // x and y always together (lift > 1e6); x and z never (filtered);
    // p appears everywhere so (x,p) lift is exactly the independence line
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "p"),
      (2L, "x"), (2L, "y"), (2L, "p"),
      (3L, "z"), (3L, "p"),
      (4L, "z"), (4L, "p")).toDF("b", "i")
    val got = Mining.pairRules(rows, "b", "i", minPairSupport = 2L)
      .select($"item_a", $"item_b", $"lift_e6").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("x", "y")) == 2000000L, "perfect co-occurrence: lift 2.0")
    assert(got(("p", "x")) == 1000000L, "independent of the universal item")
    assert(got(("p", "z")) == 1000000L)
    assert(!got.contains(("x", "z")), "never co-occur: no rule")
  }

  test("pairRules: basket-size cap fails loudly with the named conf") {
    val rows = (1L to 5L).map(i => (1L, s"i$i")).toDF("b", "i")
    spark.conf.set("graft.mining.maxBasketSize", "4")
    try {
      val e = intercept[Exception] {
        Mining.pairRules(rows, "b", "i", 1L).collect()
      }
      assert(e.getMessage.contains("graft.mining.maxBasketSize"))
    } finally spark.conf.unset("graft.mining.maxBasketSize")
    // raised cap passes: 5 items → C(5,2) = 10 pairs, each support 1
    assert(Mining.pairRules(rows, "b", "i", 1L).count() == 10L)
  }
}
