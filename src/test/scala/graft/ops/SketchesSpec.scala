package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def toks(ts: String*) = ts.toDF("t")

  test("cmsBuild: each occurrence lands once per row — per-row counter " +
      "mass equals the stream length") {
    val s = Sketches.cmsBuild(toks("a", "b", "a", "c", "a", "b"))
    val perRow = s.groupBy($"r").agg(sum($"cnt").as("m"))
      .as[(Int, Long)].collect().toMap
    assert(perRow == Map(0 -> 6L, 1 -> 6L, 2 -> 6L, 3 -> 6L))
  }

  test("cmsEstimate: never underestimates, and is exact when no buckets " +
      "collide in at least one row") {
    val stream = toks(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
    val sketch = Sketches.cmsBuild(stream)
    val est = Sketches.cmsEstimate(sketch, toks("a", "b", "c"))
      .as[(String, Long)].collect().toMap
    val exact = Map("a" -> 5L, "b" -> 3L, "c" -> 1L)
    exact.foreach { case (t, n) => assert(est(t) >= n, s"$t underestimated") }
    // 3 distinct tokens in 4×256 buckets: if some row separates all three,
    // the min is exact — verify against the actual deterministic buckets
    val collides = (0 until 4).forall { r =>
      Seq("a", "b", "c").map(t =>
        (Dedup.md5Low64(s"cms$r:$t") & 255L)).distinct.size < 3
    }
    if (!collides) assert(est == exact)
  }

  test("cmsEstimate: a term the stream never saw estimates 0 (or the " +
      "collision mass), never vanishes — empty buckets count as zero") {
    val sketch = Sketches.cmsBuild(toks("a", "a", "b"))
    val est = Sketches.cmsEstimate(sketch, toks("zzz-unseen", "a"))
      .as[(String, Long)].collect().toMap
    assert(est.contains("zzz-unseen"), "unseen term must keep a row")
    assert(est("zzz-unseen") >= 0L && est("a") >= 2L)
    // if any row separates the unseen term from both stream tokens, the
    // min hits an empty bucket and the estimate is exactly 0
    val separated = (0 until 4).exists { r =>
      val u = Dedup.md5Low64(s"cms$r:zzz-unseen") & 255L
      u != (Dedup.md5Low64(s"cms$r:a") & 255L) &&
        u != (Dedup.md5Low64(s"cms$r:b") & 255L)
    }
    if (separated) assert(est("zzz-unseen") == 0L)
  }

  test("cms sketches merge: sketch(A ++ B) = elementwise sum of the two " +
      "shard sketches (the incremental-maintenance contract)") {
    val a = toks("x", "y", "x"); val b = toks("y", "z")
    val merged = Sketches.cmsBuild(a.unionByName(b))
      .as[(Int, Long, Long)].collect().toSet
    val summed = Sketches.cmsBuild(a).unionByName(Sketches.cmsBuild(b))
      .groupBy($"r", $"bucket").agg(sum($"cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == summed)
  }

  test("cmsBucket rejects non-power-of-two widths") {
    intercept[IllegalArgumentException] {
      Sketches.cmsBucket(col("t"), 0, 100)
    }
  }
}
