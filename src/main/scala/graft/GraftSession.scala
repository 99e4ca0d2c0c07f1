package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Local-mode defaults tuned for the test harness (local[32], 128 GiB box)
  * but every setting is the one we'd want on a real cluster too:
  *   - AQE on: runtime coalescing + skew-join splitting at 100 TB.
  *   - shuffle.partitions matched to parallelism locally; on a cluster AQE's
  *     coalescing makes the initial number mostly irrelevant.
  *   - UTC session TZ: deterministic timestamp semantics vs the DuckDB oracle.
  */
object GraftSession {
  def builder(appName: String = "graft", master: Option[String] = None): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // The events table stores TIMESTAMP(NANOS) which Spark's µs TimestampType
      // cannot hold; read as raw nanos-since-epoch LongType and normalize in
      // Tables.events (exact integer math — no double round-trip).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    master.fold(b)(m => b.master(m))
  }

  /** Shared local session for tests and mains run outside spark-submit. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName, Some(s"local[$cpus]")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
