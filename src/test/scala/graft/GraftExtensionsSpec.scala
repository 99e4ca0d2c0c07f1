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

  test("md5_low64 is callable from SQL and matches the kernel hash") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Bridge.registerExtensionFunctions(ext, spark)
    Seq("42", "hello").toDF("s").createOrReplaceTempView("ext_md5")
    val got = spark.sql("SELECT md5_low64(s) AS h FROM ext_md5").as[Long].collect()
    // the SQL face, the Column face, and the JVM kernel agree bit-for-bit
    assert(got(0) == graft.functions.Md5Low64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("42")))
    assert(got(1) == graft.functions.Md5Low64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
  }
}
