package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("joinSizeAudit: Σ cl·cr predicts the join exactly; actual optional") {
    // left keys [1,1,2,3], right keys [1,2,2,4]:
    // per-key products 1→2·1, 2→1·2 → predicted 4 = actual; max mult 2.
    val l = Seq(1L, 1L, 2L, 3L).toDF("lk")
    val r = Seq(1L, 2L, 2L, 4L).toDF("rk")
    val got = Profile.joinSizeAudit(l, r, col("lk"), col("rk"), "t").collect()(0)
    assert(got.getString(0) == "t")
    assert(got.getLong(1) == 4L && got.getLong(2) == 4L) // n_left/n_right
    assert(got.getLong(3) == 2L)                          // match keys
    assert(got.getLong(4) == 4L)                          // predicted
    assert(got.getLong(5) == 2L)                          // max multiplicity
    assert(got.getLong(6) == 4L)                          // actual == predicted

    val noActual = Profile.joinSizeAudit(l, r, col("lk"), col("rk"), "t",
      withActual = false).collect()(0)
    assert(noActual.isNullAt(6) && noActual.getLong(4) == 4L)

    // disjoint key spaces: zero estimate, zero actual, no nulls
    val disj = Profile.joinSizeAudit(Seq(9L).toDF("lk"), r,
      col("lk"), col("rk"), "d").collect()(0)
    assert(disj.getLong(3) == 0L && disj.getLong(4) == 0L
      && disj.getLong(6) == 0L)
  }
}
