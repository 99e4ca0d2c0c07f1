package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.LenientDate

/** Date de-identification (SURVEY.md J2/F1-F5;
  * /root/reference/dcc_transforms.py:34-174), three modes:
  *
  *  - `dobShift`: per-record shift = standard_date − date-of-birth; every
  *    date field moves by its record's shift, so intra-record deltas are
  *    preserved while absolute dates are anonymized (dcc_transforms.py:44-110)
  *  - `totalSeconds`: date → integer seconds between the standard date and
  *    the value (dcc_transforms.py:112-128)
  *  - `fixedShift`: date + constant seconds (dcc_transforms.py:130-174)
  *
  * Output granularity per field comes from the field map's date status
  * (Model.dateStatusGranularity). Cleaned rows get
  * `kpmp_date_cleaned = true` and `kpmp_date_cleaned_type = <the full
  * status verbatim>` (dcc_transforms.py:103 stores date_type; the `[9:]`
  * slice applies only to transform METADATA granularity) — the PHI filter
  * admits exactly these.
  *
  * Divergences from the reference, chosen for distributed determinism and
  * documented per SURVEY §7.4:
  *  - duplicate dob rows: reference keeps the python-dict-insertion *last*;
  *    we keep the maximum parsed dob (deterministic under any partitioning).
  *  - unparseable dates: the reference crashes in two of three modes; we
  *    always leave the row uncleaned (→ dropped fail-closed by the PHI
  *    filter) and surface it on the error channel.
  *
  * All arithmetic is integer epoch-seconds — codegen-friendly, no UDFs.
  */
object DateShift {

  final case class Result(eav: DataFrame, errors: DataFrame)

  /** (field_name, granularity-pattern, cleaned-type) rows of the map. */
  private def dateFields(fieldMap: DataFrame): DataFrame = {
    val granularity = Model.dateStatusGranularity.foldLeft(lit(null).cast("string")) {
      case (acc, (status, pattern)) => when(col("status") === status, pattern).otherwise(acc)
    }
    FieldMap.normalize(fieldMap)
      .filter(col("status").isin(Model.dateStatuses: _*))
      .dropDuplicates("field_name") // see PhiFilter: no join fan-out on dup control rows
      .select(
        col("field_name"),
        granularity.as("__gran"),
        // the cleaned-type IS the full status (dcc_transforms.py:103 stores
        // date_type verbatim; the [9:] slice applies only to the
        // transform-metadata granularity field)
        col("status").as("__ctype"))
  }

  private def parsedValue: Column = LenientDate.parseTs(col("value"))

  /** Render `ts` at the row's granularity — `date_format` needs a literal
    * pattern, so this is a 4-arm CASE (still codegen'd). */
  private def renderByGran(ts: Column): Column =
    Model.dateStatusGranularity.values.toSeq.sorted.foldLeft(lit(null).cast("string")) {
      case (acc, pattern) =>
        when(col("__gran") === pattern, date_format(ts, pattern)).otherwise(acc)
    }

  /** Tag each EAV row with its date-field granularity (null = not a date
    * field) via broadcast join on the control table. */
  private def tagged(eav: DataFrame, fieldMap: DataFrame): DataFrame =
    eav.join(broadcast(dateFields(fieldMap)), Seq("field_name"), "left")

  /** Shared core: tag date fields, rewrite `value` with `rendered` where the
    * row parses (and `extraOk` holds), mark cleaned, surface failures. */
  private def applyShift(eav: DataFrame, fieldMap: DataFrame, rendered: Column,
      extraOk: Column = lit(true)): Result = {
    val t = tagged(eav, fieldMap).withColumn("__parsed", parsedValue)
    val isDate = col("__gran").isNotNull
    val ok = isDate && col("__parsed").isNotNull && extraOk
    val out = t
      .withColumn("value", when(ok, rendered).otherwise(col("value")))
      .withColumn("kpmp_date_cleaned",
        when(ok, lit(true)).otherwise(col("kpmp_date_cleaned")))
      .withColumn("kpmp_date_cleaned_type",
        when(ok, col("__ctype")).otherwise(col("kpmp_date_cleaned_type")))
    val errors = t.filter(isDate && !(col("__parsed").isNotNull && extraOk))
      .select(col("record_id"), col("field_name"), col("value")).distinct()
    Result(dropInternal(out), errors)
  }

  /** Mode 1: per-record dob shift. `standardDate` is the anchor all records
    * land on (ISO string, config `standard_date`). */
  def dobShift(eav: DataFrame, fieldMap: DataFrame, standardDate: String,
      dobField: String = "np_dob"): Result = {
    val anchor = unix_timestamp(LenientDate.parseTs(lit(standardDate)))
    // deterministic "winner" per record: max parsed dob (see scaladoc)
    val shifts = eav
      .filter(col("field_name") === dobField)
      .select(col("record_id"), LenientDate.parseTs(col("value")).as("__dob"))
      .filter(col("__dob").isNotNull)
      .groupBy(col("record_id"))
      .agg(max(col("__dob")).as("__dob"))
      .select(col("record_id"), (anchor - unix_timestamp(col("__dob"))).as("__shift_s"))
    // shift table: one row per participant — small relative to the EAV fact
    // plane, but grows with SF, so let AQE pick broadcast vs shuffle.
    val withShift = eav.join(shifts, Seq("record_id"), "left")
    val shifted = timestamp_seconds(unix_timestamp(col("__parsed")) + col("__shift_s"))
    applyShift(withShift, fieldMap,
      renderByGran(shifted), extraOk = col("__shift_s").isNotNull)
  }

  /** Mode 2: seconds-until-standard-date (integer string output). */
  def totalSeconds(eav: DataFrame, fieldMap: DataFrame, standardDate: String): Result = {
    val anchor = unix_timestamp(LenientDate.parseTs(lit(standardDate)))
    val secs = (anchor - unix_timestamp(col("__parsed"))).cast("long")
    applyShift(eav, fieldMap, secs.cast("string"))
  }

  /** Mode 3: constant shift (config `shifting_seconds`). */
  def fixedShift(eav: DataFrame, fieldMap: DataFrame, shiftSeconds: Long): Result = {
    val shifted = timestamp_seconds(unix_timestamp(col("__parsed")) + lit(shiftSeconds))
    applyShift(eav, fieldMap, renderByGran(shifted))
  }

  private def dropInternal(df: DataFrame): DataFrame = {
    val internal = df.columns.filter(_.startsWith("__"))
    df.drop(internal: _*)
  }
}
