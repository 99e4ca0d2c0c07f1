package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample: deterministic, partition-invariant, subset of input") {
    val df = (0L until 1000L).toDF("id")
    val a = Sampling.hashSample(df, $"id", 20).as[Long].collect().sorted
    val b = Sampling.hashSample(df.repartition(7), $"id", 20).as[Long].collect().sorted
    assert(a.sameElements(b))            // partition-order invariant
    assert(a.toSet.subsetOf((0L until 1000L).toSet))
    // rate lands near 20% (hash buckets are near-uniform)
    assert(a.length > 100 && a.length < 300)
    // pct 100 keeps everything, 0 keeps nothing
    assert(Sampling.hashSample(df, $"id", 100).count() == 1000)
    assert(Sampling.hashSample(df, $"id", 0).count() == 0)
  }

  test("stratifiedSample: per-stratum rates, default for unlisted strata") {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val out = Sampling.stratifiedSample(df, $"s", $"id",
        rates = Map("a" -> 100, "b" -> 0), defaultPct = 30)
      .groupBy($"s").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out("a") == 1000)             // stratum kept whole
    assert(!out.contains("b"))           // stratum dropped entirely
    assert(out("c") > 150 && out("c") < 450) // default ~30%
  }

  test("sampling nests consistently: pct 10 ⊆ pct 50 (bucket monotonicity)") {
    val df = (0L until 500L).toDF("id")
    val small = Sampling.hashSample(df, $"id", 10).as[Long].collect().toSet
    val big = Sampling.hashSample(df, $"id", 50).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }
}
