package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-to-plan transform modules (SURVEY.md §2.11;
  * /root/reference/transform.py:4-39). Each transform takes the EAV plane
  * and returns a possibly-rewritten EAV plane plus appended
  * TransformRecord rows under its namespace — the reference's
  * `process_records` 1→N generator contract, expressed as DataFrame →
  * DataFrame (plan composition, nothing materializes until the sink).
  */
trait EtlTransform {
  def namespace: String
  /** @return (EAV plane after this transform, transform records to append) */
  def apply(eav: DataFrame): (DataFrame, Option[DataFrame])
}

/** Date de-id as a pipeline stage. The reference runs this in one of two
  * shapes (`dob_shift_inplace`, dcc_transforms.py:34-36,100-110):
  *  - in-place (default): `value` is rewritten and the row marked cleaned,
  *    so the PHI filter admits it;
  *  - side-output: the EAV plane is untouched (uncleaned date rows will be
  *    dropped fail-closed) and each shifted date is emitted as a
  *    TransformRecord under this transform's namespace.
  */
final class DateShiftTransform(
    fieldMap: DataFrame,
    mode: String,                    // dob_shifting | total_seconds | date_shifting
    standardDate: String = "2010-01-01",
    shiftSeconds: Long = 0L,
    inPlace: Boolean = true,
    val namespace: String = "date_deid") extends EtlTransform {
  def apply(eav: DataFrame): (DataFrame, Option[DataFrame]) = {
    val r = mode match {
      case "dob_shifting"  => DateShift.dobShift(eav, fieldMap, standardDate)
      case "total_seconds" => DateShift.totalSeconds(eav, fieldMap, standardDate)
      case "date_shifting" => DateShift.fixedShift(eav, fieldMap, shiftSeconds)
      case other => throw new IllegalArgumentException(s"unknown datetransform_type: $other")
    }
    if (inPlace) (r.eav, None)
    else {
      val records = r.eav
        .filter(col("kpmp_date_cleaned") === true)
        .select(
          col("record_id"),
          lit(namespace).as("namespace"),
          col("field_name"),
          col("value").as("field_value"))
      (eav, Some(records))
    }
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
    val namespace: String = "kpmp_calculated_variables",
    idColumn: String = "study_id") extends EtlTransform {
  def apply(eav: DataFrame): (DataFrame, Option[DataFrame]) = {
    // study_id → redcap_id rename, dcc_transforms.py:231-232
    val wide = deidWide.withColumnRenamed(idColumn, "redcap_id")
      .na.fill("") // fillna('') path, dcc_transforms.py:233
    val ids = eav.select(col("record_id")).distinct()
    val joined = ids.join(wide, ids("record_id") === wide("redcap_id"), "inner")
    val valueCols = wide.columns.filter(_ != "redcap_id")
    val records = joined
      .unpivot(
        Array(col("record_id")),
        valueCols.map(c => col(c).cast("string")),
        "field_name", "field_value")
      .withColumn("namespace", lit(namespace))
      .select("record_id", "namespace", "field_name", "field_value")
    (eav, Some(records))
  }
}

/** Secondary-ID mapping (SURVEY.md J4;
  * /root/reference/dcc_transforms.py:271-306): left lookup join, missing
  * mapping → null value row (the reference emits None). The mapping file is
  * a control table → broadcast.
  */
final class SecondaryIdTransform(
    mapping: DataFrame,              // redcap_record_id, secondary_id
    val namespace: String = "secondary_id",
    outputField: String = "secondary_id") extends EtlTransform {
  def apply(eav: DataFrame): (DataFrame, Option[DataFrame]) = {
    val ids = eav.select(col("record_id")).distinct()
    val records = ids
      .join(broadcast(mapping), ids("record_id") === mapping("redcap_record_id"), "left")
      .select(
        col("record_id"),
        lit(namespace).as("namespace"),
        lit(outputField).as("field_name"),
        col("secondary_id").cast("string").as("field_value"))
    (eav, Some(records))
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
      uniqueFields: DataFrame)

  def run(eav: DataFrame, fieldMap: DataFrame, transforms: Seq[EtlTransform]): Result = {
    var plane = eav
    val appended = Seq.newBuilder[DataFrame]
    transforms.foreach { t =>
      val (next, recs) = t(plane)
      plane = next
      recs.foreach(appended += _)
    }
    val phi = PhiFilter(plane, fieldMap)
    val allRecords = appended.result() match {
      case Nil => None
      case h :: t => Some(t.foldLeft(h)(_.unionByName(_)))
    }
    Result(phi.kept, allRecords, phi.unknownFields, phi.uniqueFields)
  }
}
