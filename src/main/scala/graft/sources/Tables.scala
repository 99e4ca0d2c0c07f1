package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * Thin on purpose: `spark.read.parquet` already gives column pruning and
  * predicate pushdown; anything more would fight Catalyst. The dimension
  * tables (`region`, `nation`, and at test scale `supplier`/`customer`/`part`)
  * are broadcast-join candidates — callers mark them with `broadcast(...)`
  * at the join site, where the size knowledge lives.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LongType nanos.
    * Expose both: `ts_ns` (exact, for ordering/arithmetic — matches DuckDB
    * `epoch_ns(ts)`) and `ts` (µs-truncated TimestampType for date functions,
    * windows, streaming). Integer `div`, never double division: nanos ≈ 1.7e18
    * exceeds a double's 53-bit mantissa.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(load(s, d, "events"))

  /** The same events table as an unbounded stream (file source). The
    * parquet "file" is a single file, and the streaming file source wants a
    * directory — glob-filter the parent. Schema comes from a batch peek
    * (streaming sources can't infer). */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    val rawSchema = load(s, d, "events").schema
    normalizeEvents(
      s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d))
  }

  private def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) via nanosAsLong
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // re-written copies (e.g. DuckDB-replicated scale sets) come back
        // NTZ; values are UTC wall-clock, so the cast is value-preserving
        // under the session's UTC zone
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every test table as a temp view (events through the same
    * ts/ts_ns normalization as [[events]]), plus the EAV connector as
    * `eav` when `eavPath` is given — so the whole engine is drivable from
    * pure SQL: `spark.sql("SELECT … FROM lineitem JOIN orders …")`.
    * Temp views are metadata-only: each query still plans straight against
    * the parquet scan (pruning/pushdown intact), nothing is materialized.
    */
  def registerAll(s: SparkSession, d: String, eavPath: Option[String] = None): Unit = {
    all.foreach {
      case "events" => events(s, d).createOrReplaceTempView("events")
      case t => load(s, d, t).createOrReplaceTempView(t)
    }
    eavPath.foreach { p =>
      s.read.format("graft-eav").option("path", p).load()
        .createOrReplaceTempView("eav")
    }
  }
}
