package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corrupt-record side channels for schema'd text ingest — the A6
  * error-channel pattern (SURVEY.md §2.4: report and drop, never crash) at
  * the SOURCE boundary, where the reference would crash on a malformed
  * REDCap CSV row (csv.DictReader yields whatever it parses;
  * dcc_transforms' date modes throw on junk — dcc_transforms.py:121,138).
  *
  * PERMISSIVE parse + a `_corrupt_record` column splits the input into
  * (clean rows, rejected raw lines) in ONE read: the malformed original
  * line rides the reserved column, so the reject channel can be persisted
  * for repair/replay with full fidelity. FAILFAST stays the right mode for
  * control-plane tables (FieldMap.load) where a bad row must stop the job;
  * this is for data-plane feeds where it must not.
  */
object ErrorChannel {

  val corruptCol = "_corrupt_record"

  /** The two channels plus the lifetime of the shared cached parse: both
    * `clean` and `rejects` read the same persisted frame, so the CALLER
    * decides when both have been consumed and calls [[unpersist]] —
    * otherwise a long-lived session calling csv()/json() repeatedly leaks
    * cached partitions. Destructures like a pair:
    * `val Channels(clean, rejects) = ErrorChannel.csv(...)`. */
  final case class Channels(clean: DataFrame, rejects: DataFrame)(
      parsed: DataFrame) {
    /** Release the shared cached parse. Call AFTER both channels are
      * consumed: Spark disallows recomputing a query that references only
      * the corrupt-record column straight from the raw file
      * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
      * channels are not re-readable once the cache is dropped. */
    def unpersist(): Unit = { parsed.unpersist(); () }
  }

  /** Read a CSV with a declared schema; rows that don't parse land on the
    * reject side with their raw line intact. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): Channels =
    split(spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(withCorrupt(schema))
      .csv(path))

  /** Same contract for NDJSON. */
  def json(spark: SparkSession, path: String, schema: StructType): Channels =
    split(spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(withCorrupt(schema))
      .json(path))

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(corruptCol, StringType))

  private def split(raw: DataFrame): Channels = {
    // Spark requires caching (or re-reading) when filtering on the corrupt
    // column alone; persist the narrow parsed frame once for both sides
    val parsed = raw.cache()
    val clean = parsed.filter(col(corruptCol).isNull).drop(corruptCol)
    val rejects = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    Channels(clean, rejects)(parsed)
  }
}
