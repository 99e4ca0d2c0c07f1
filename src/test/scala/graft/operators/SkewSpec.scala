package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin ≡ plain join") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    def summarize(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("s")).collect().head.toSeq
    assert(summarize(li.join(o, Seq("l_orderkey"))) ==
      summarize(Skew.saltedJoin(li, o, "l_orderkey", 8)))
    // left join with unmatched keys preserved
    val oSub = o.filter($"l_orderkey" % 2 === 0)
    assert(summarize(li.join(oSub, Seq("l_orderkey"), "left")) ==
      summarize(Skew.saltedJoin(li, oSub, "l_orderkey", 8, "left")))
  }

  test("saltedAgg ≡ plain aggregation for sum/count") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("decimal(18,2)").as("q"), lit(1L).as("one"))
    val plain = li.groupBy("l_returnflag")
      .agg(sum($"q").as("q"), sum($"one").as("one"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), 16)(
      ("q", c => sum(c), c => sum(c)),
      ("one", c => sum(c), c => sum(c)))
      .orderBy("l_returnflag").collect()
    assert(plain.map(_.toSeq.toList).toList == salted.map(_.toSeq.toList).toList)
  }
}
