package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.Bridge

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_fingerprint is callable from SQL after extension injection") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // bind into the live shared session (builder-time binding would need a
    // fresh SparkContext; the injection list is identical either way)
    Bridge.registerExtensionFunctions(ext, spark)
    Seq("hello world", "hello world", "other").toDF("s").createOrReplaceTempView("ext_t")
    val fps = spark.sql("SELECT rolling_fingerprint(s) AS fp FROM ext_t")
      .as[Long].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }
}
