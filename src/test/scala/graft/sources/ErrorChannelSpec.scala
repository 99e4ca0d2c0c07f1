package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.types._

class ErrorChannelSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("qty", IntegerType),
    StructField("name", StringType)))

  test("csv: malformed rows land on the reject channel with the raw line") {
    val dir = Files.createTempDirectory("errch").toFile
    val f = new java.io.File(dir, "rows.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,qty,name")
    w.println("1,10,alpha")
    w.println("2,not-a-number,beta") // qty fails the int cast
    w.println("3,30,gamma")
    w.close()
    val ch @ ErrorChannel.Channels(clean, rejects) =
      ErrorChannel.csv(spark, f.getAbsolutePath, schema)
    assert(clean.as[(Long, Int, String)].collect().toSet ==
      Set((1L, 10, "alpha"), (3L, 30, "gamma")))
    val bad = rejects.as[String].collect().toSeq
    assert(bad == Seq("2,not-a-number,beta")) // raw line, full fidelity
    ch.unpersist() // both channels consumed — release the shared cache
  }

  test("json: junk lines rejected, valid rows parse") {
    val dir = Files.createTempDirectory("errjs").toFile
    val f = new java.io.File(dir, "rows.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "qty": 10, "name": "alpha"}""")
    w.println("""this is not json""")
    w.println("""{"id": 2, "qty": 20, "name": "beta"}""")
    w.close()
    val ch @ ErrorChannel.Channels(clean, rejects) =
      ErrorChannel.json(spark, f.getAbsolutePath, schema)
    assert(clean.count() == 2)
    assert(rejects.as[String].collect().toSeq == Seq("this is not json"))
    ch.unpersist()
  }

  test("all-clean input: empty reject channel, nothing dropped") {
    val dir = Files.createTempDirectory("errok").toFile
    val f = new java.io.File(dir, "rows.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,qty,name"); w.println("1,1,a"); w.println("2,2,b")
    w.close()
    val ch @ ErrorChannel.Channels(clean, rejects) =
      ErrorChannel.csv(spark, f.getAbsolutePath, schema)
    assert(clean.count() == 2 && rejects.count() == 0)
    ch.unpersist()
  }
}
