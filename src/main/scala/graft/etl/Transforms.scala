package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-to-plan transform modules (SURVEY.md §2.11;
  * /root/reference/transform.py:4-39). Each transform takes the EAV plane
  * and returns a possibly-rewritten EAV plane, appended TransformRecord
  * rows under its namespace, and an error side-channel — the reference's
  * `process_records` 1→N generator contract plus its logging channel,
  * expressed as DataFrame → DataFrame (plan composition, nothing
  * materializes until the sink).
  */
final case class TransformOutput(
    eav: DataFrame,
    records: Option[DataFrame] = None,
    errors: Option[DataFrame] = None)

trait EtlTransform {
  def namespace: String
  def apply(eav: DataFrame): TransformOutput
  /** Per-transform schema/dictionary rows (the reference's
    * `get_transform_metadata`, transform.py:26-39) — shipped once in the
    * header document. None when the transform publishes no dictionary. */
  def metadata(spark: org.apache.spark.sql.SparkSession): Option[DataFrame] = None
}

/** Date de-id as a pipeline stage. Mode semantics follow the reference
  * exactly (dcc_transforms.py:34-174):
  *  - `dob_shifting` honors `inPlace` (config `dob_shift_inplace`):
  *    in-place rewrites `value` and marks the row cleaned so the PHI filter
  *    admits it; side-output leaves the plane untouched (uncleaned date
  *    rows drop fail-closed) and emits each date shifted BY THIS stage as
  *    a TransformRecord (pre-state snapshot excludes upstream-cleaned rows);
  *  - `total_seconds` and `date_shifting` ALWAYS side-output — the
  *    reference has no in-place branch for them (dcc_transforms.py:114-174),
  *    so `inPlace` is ignored for these modes.
  * Unparseable-date rows surface on the error channel in all shapes
  * (the reference logs them; dcc_transforms.py:57-73).
  */
final class DateShiftTransform(
    fieldMap: DataFrame,
    mode: String,                    // dob_shifting | total_seconds | date_shifting
    standardDate: String = "2010-01-01",
    shiftSeconds: Long = 0L,
    inPlace: Boolean = true,
    // the reference's data_namespace verbatim (dcc_transforms.py:12)
    val namespace: String = "TransformedDate") extends EtlTransform {
  def apply(eav: DataFrame): TransformOutput = {
    val pre = eav.withColumn("pre_cleaned_flag", coalesce(col("kpmp_date_cleaned"), lit(false)))
    val r = mode match {
      case "dob_shifting"  => DateShift.dobShift(pre, fieldMap, standardDate)
      case "total_seconds" => DateShift.totalSeconds(pre, fieldMap, standardDate)
      case "date_shifting" => DateShift.fixedShift(pre, fieldMap, shiftSeconds)
      case other => throw new IllegalArgumentException(s"unknown datetransform_type: $other")
    }
    val errors = Some(r.errors.withColumn("namespace", lit(namespace)))
    val effectiveInPlace = inPlace && mode == "dob_shifting"
    if (effectiveInPlace) TransformOutput(r.eav.drop("pre_cleaned_flag"), None, errors)
    else {
      val records = r.eav
        .filter(col("kpmp_date_cleaned") === true && !col("pre_cleaned_flag"))
        .select(
          col("record_id"),
          lit(namespace).as("namespace"),
          col("field_name"),
          col("value").as("field_value"))
      TransformOutput(eav, Some(records), errors)
    }
  }

  /** Field→granularity dictionary (the reference's get_transform_metadata,
    * dcc_transforms.py:176-190: granularity = `status[9:]`, and the
    * dictionary is published ONLY in total_seconds mode — other modes
    * return None, exactly like the reference). */
  override def metadata(spark: org.apache.spark.sql.SparkSession): Option[DataFrame] =
    if (mode != "total_seconds") None
    else Some {
      FieldMap.normalize(fieldMap)
        .filter(col("status").isin(Model.dateStatuses: _*))
        .dropDuplicates("field_name")
        .select(col("field_name"),
          regexp_replace(col("status"), "^Transform", "").as("granularity"))
    }
}

/** Calc-variable enrichment (SURVEY.md J3+R2;
  * /root/reference/dcc_transforms.py:177-268): distinct participant ids
  * probe the wide de-id table; every matched calc column fans out to one
  * TransformRecord. The wide→EAV reshape is `unpivot`, the probe an inner
  * join — Catalyst plans the distinct as partial aggregation, and the join
  * shuffles on record_id (or broadcasts under AQE when the de-id table is
  * small).
  */
final class CalcVariableTransform(
    deidWide: DataFrame,
    // the reference's data_namespace verbatim (dcc_transforms.py:190)
    val namespace: String = "CalcVars",
    idColumn: String = "study_id",
    /** Curated de-id data dictionary CSV (config `deid_data_dictionary_file`)
      * published as this transform's header dictionary. */
    deidDataDictionary: Option[DataFrame] = None) extends EtlTransform {
  def apply(eav: DataFrame): TransformOutput = {
    // study_id → redcap_id rename, dcc_transforms.py:231-232; dedupe the
    // control side so a duplicated participant row can't fan out records
    // (reference dict build collapses duplicates)
    val wide = deidWide.withColumnRenamed(idColumn, "redcap_id")
      .dropDuplicates("redcap_id")
    val ids = eav.select(col("record_id")).distinct()
    val joined = ids.join(wide, ids("record_id") === wide("redcap_id"), "inner")
    val valueCols = wide.columns.filter(_ != "redcap_id")
    val records = joined
      .unpivot(
        Array(col("record_id")),
        // fillna('') applies to every column (dcc_transforms.py:233):
        // cast-then-coalesce so numeric nulls become "" too
        valueCols.map(c => coalesce(col(c).cast("string"), lit("")).as(c)),
        "field_name", "field_value")
      .withColumn("namespace", lit(namespace))
      .select("record_id", "namespace", "field_name", "field_value")
    TransformOutput(eav, Some(records))
  }

  /** The de-id data dictionary rows (the reference's get_transform_metadata,
    * dcc_transforms.py:272-278: read deid_data_dictionary_file, fillna("")).
    * fillna applies to every column — cast-then-coalesce so non-string
    * nulls become "" too, matching pandas' object-frame behavior. */
  override def metadata(spark: org.apache.spark.sql.SparkSession): Option[DataFrame] =
    deidDataDictionary.map { d =>
      d.select(d.columns.map(c =>
        coalesce(col(s"`$c`").cast("string"), lit("")).as(c)): _*)
    }
}

/** Secondary-ID mapping (SURVEY.md J4;
  * /root/reference/dcc_transforms.py:271-306): left lookup join, missing
  * mapping → null value row (the reference emits None). The mapping file is
  * a control table → broadcast.
  */
final class SecondaryIdTransform(
    mapping: DataFrame,              // redcap_record_id, secondary_id
    // the reference's data_namespace verbatim (dcc_transforms.py:282)
    val namespace: String = "SecondaryID",
    outputField: String = "secondary_id") extends EtlTransform {
  def apply(eav: DataFrame): TransformOutput = {
    val ids = eav.select(col("record_id")).distinct()
    val dedupedMapping = mapping.dropDuplicates("redcap_record_id") // see CalcVariableTransform
    val records = ids
      .join(broadcast(dedupedMapping), ids("record_id") === dedupedMapping("redcap_record_id"), "left")
      .select(
        col("record_id"),
        lit(namespace).as("namespace"),
        lit(outputField).as("field_name"),
        col("secondary_id").cast("string").as("field_value"))
    TransformOutput(eav, Some(records))
  }

  /** Static descriptor row (the reference's get_transform_metadata,
    * dcc_transforms.py:310-316). */
  override def metadata(spark: org.apache.spark.sql.SparkSession): Option[DataFrame] = {
    import spark.implicits._
    Some(Seq((outputField,
      "Secondary unique identifier for use in public data set"))
      .toDF("field_name", "description"))
  }
}

/** Orchestrator (SURVEY.md §3.1 stages 8-9;
  * /root/reference/redcap-etl.py:358-380,399-422). Transforms run strictly
  * before the PHI filter — the date transform marks rows the filter then
  * admits, and the dob-shift build needs `np_dob` rows the filter would
  * remove ("always restrict to the safe phi free list last",
  * redcap-etl.py:412-416).
  */
object Pipeline {
  final case class Result(
      kept: DataFrame,
      transformRecords: Option[DataFrame],
      unknownFields: DataFrame,
      uniqueFields: DataFrame,
      transformErrors: Option[DataFrame],
      /** (namespace, dictionary rows) per transform that publishes one —
        * shipped once in the header document (Sinks.headerDocument). */
      transformMetadata: Seq[(String, DataFrame)])

  def run(eav: DataFrame, fieldMap: DataFrame, transforms: Seq[EtlTransform]): Result = {
    var plane = eav
    val appended = Seq.newBuilder[DataFrame]
    val errs = Seq.newBuilder[DataFrame]
    transforms.foreach { t =>
      val out = t(plane)
      plane = out.eav
      out.records.foreach(appended += _)
      out.errors.foreach(errs += _)
    }
    val phi = PhiFilter(plane, fieldMap)
    def unionAll(dfs: Seq[DataFrame]): Option[DataFrame] = dfs match {
      case Nil => None
      case h :: t => Some(t.foldLeft(h)(_.unionByName(_)))
    }
    val meta = transforms.flatMap(t => t.metadata(eav.sparkSession).map(t.namespace -> _))
    Result(phi.kept, unionAll(appended.result()), phi.unknownFields,
      phi.uniqueFields, unionAll(errs.result()), meta)
  }
}
