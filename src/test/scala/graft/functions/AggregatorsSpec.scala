package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.udaf

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean: exact, partition-order independent, SQL-registrable") {
    val wm = udaf(new Aggregators.WeightedMean)
    spark.udf.register("wmean", wm)
    val df = Seq((1.50, 1L), (2.50, 3L), (4.00, 0L)).toDF("v", "w")
    val r1 = df.agg(wm($"v", $"w")).as[Double].head()
    val r2 = df.repartition(8).agg(wm($"v", $"w")).as[Double].head()
    assert(r1 == 2.25 && r2 == 2.25) // (1.5 + 3*2.5) / 4
    df.createOrReplaceTempView("wm_t")
    assert(spark.sql("SELECT wmean(v, w) FROM wm_t").as[Double].head() == 2.25)
  }

  test("TopK: bounded buffer, deterministic tie-break, merge across partitions") {
    val topk = udaf(new Aggregators.TopK(3))
    val df = Seq((5.0, 1L), (9.0, 2L), (9.0, 3L), (1.0, 4L), (7.0, 5L))
      .toDF("v", "id").repartition(4)
    val r = df.agg(topk($"v", $"id")).as[Seq[Long]].head()
    assert(r == Seq(2L, 3L, 5L)) // 9.0(id2) > 9.0(id3) > 7.0(id5)
  }
}
