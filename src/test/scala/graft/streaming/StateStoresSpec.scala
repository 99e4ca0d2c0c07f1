package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StateStoresSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    Doc(1, "the quick brown fox jumps over the lazy dog and that is a fine thing to see", "en", "a", 0),
    Doc(2, "the quick brown fox jumps over the lazy dog and that is a fine thing to see", "en", "a", 0),
    Doc(3, "a completely different document about distributed state stores and their checkpoints", "en", "b", 0),
    Doc(4, "yet another unique body of text that should survive the dedup ledger intact", "en", "b", 0))

  test("stateful dedup under RocksDB ≡ default provider; provider actually engaged") {
    // default-provider run
    val in1 = MemoryStream[Doc](spark)
    in1.addData(docs: _*)
    val q1 = DocumentStreams.dedupByContent(DocumentStreams.prepare(in1.toDF()))
      .writeStream.format("memory").queryName("ss_default").outputMode("append").start()
    q1.processAllAvailable(); q1.stop()

    // RocksDB run, state accumulated across two micro-batches
    val (fps2, metrics) = StateStores.withRocksDB(spark) {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass") ==
        StateStores.RocksDBProviderClass)
      val in2 = MemoryStream[Doc](spark)
      val q2 = DocumentStreams.dedupByContent(DocumentStreams.prepare(in2.toDF()))
        .writeStream.format("memory").queryName("ss_rocks").outputMode("append").start()
      in2.addData(docs.take(2): _*); q2.processAllAvailable()
      in2.addData(docs.drop(2): _*); q2.processAllAvailable()
      val m = q2.lastProgress.stateOperators(0).customMetrics
      q2.stop()
      (spark.table("ss_rocks").select($"fp").as[Long].collect().toSet, m)
    }
    // same dedup ledger semantics under either provider
    assert(fps2 ==
      spark.table("ss_default").select($"fp").as[Long].collect().toSet)
    assert(fps2.size == 3) // exact dup collapsed across batches
    // the query really ran on RocksDB: its provider-specific metrics exist
    val keys = metrics.keySet()
    assert(keys.stream().anyMatch(_.startsWith("rocksdb")),
      s"no rocksdb metrics in $keys")
    // conf restored for the shared session
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .forall(_ != StateStores.RocksDBProviderClass))
  }
}
