package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("hamming: exact positional distance") {
    val df = Seq(("abcdefgh", "abcdefgh", 0), ("abcdefgh", "abXdefgY", 2),
      ("abcdefgh", "XXXXXXXX", 8)).toDF("a", "b", "exp")
    val got = df.select(RecordLinkage.hamming($"a", $"b", 8).as("d"), $"exp")
      .as[(Int, Int)].collect()
    got.foreach { case (d, e) => assert(d == e) }
  }

  test("pigeonhole blocking is lossless: pairs ≡ brute force on planted typos") {
    val base = "the quick brown fox jump"  // 24 chars
    def mutate(s: String, at: Seq[Int]): String =
      at.foldLeft(s)((acc, i) => acc.updated(i, 'Z'))
    val rows = Seq(
      (1L, base), (2L, mutate(base, Seq(3))), (3L, mutate(base, Seq(3, 17))),
      (4L, mutate(base, Seq(0, 8, 16))), // distance 3: must NOT pair with 1
      (5L, "completely different str"), (6L, base)).toDF("id", "key")
    val got = RecordLinkage.hammingKeyJoin(rows, "id", "key", 24, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // brute force oracle
    val ks = rows.as[(Long, String)].collect()
    val exp = (for {
      (ia, ka) <- ks; (ib, kb) <- ks if ia < ib
      d = ka.zip(kb).count { case (x, y) => x != y } if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == exp)
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 6L, 0)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("short keys are excluded, not padded") {
    val rows = Seq((1L, "short"), (2L, "exactly-twenty-four-char"),
      (3L, "exactly-twenty-four-chaX")).toDF("id", "key")
    val got = RecordLinkage.hammingKeyJoin(rows, "id", "key", 24, 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((2L, 3L, 1)))
  }

  test("editDistance1Join ≡ brute-force levenshtein=1 over a typo'd vocabulary") {
    val words = Seq("spark", "spar", "sparc", "spork", "sparks", "query",
      "quer", "queries", "plan", "plant", "pant", "flan", "ab", "ba", "a")
    val df = words.toDF("key")
    val got = RecordLinkage.editDistance1Join(df)
      .as[(String, String)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val exp = (for (x <- words; y <- words if x < y && lev(x, y) == 1)
      yield (x, y)).toSet
    assert(got == exp)
    // the transposition pair shares deletion variants but is distance 2
    assert(!got.contains(("ab", "ba")))
    // substitution, deletion, and insertion all present
    assert(got.contains(("spark", "spork")) && got.contains(("spar", "spark"))
      && got.contains(("plan", "plant")))
  }
}
