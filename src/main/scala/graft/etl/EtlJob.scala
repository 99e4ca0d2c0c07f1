package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.IniConfig

/** Config-driven pipeline entry point — the reference's `main()` lifecycle
  * (SURVEY.md §3.1; /root/reference/redcap-etl.py:399-431) on the engine:
  *
  *   config → [validate project] → extract (graft-eav DSv2 or files) →
  *   transforms (per `dcc_transforms`) → PHI filter → envelopes + header →
  *   NDJSON out (the `--fake` path) or a caller-supplied POST.
  *
  * A reference user keeps their INI sections (`default`, `dcc_transforms`,
  * `redcap`, `datalake`) and swaps the runtime.
  */
object EtlJob {

  final case class Output(
      pipeline: Pipeline.Result,
      envelopes: DataFrame,
      recordEnvelopes: Option[DataFrame],
      header: String)

  /** Read the EAV plane per config: `eav_source` = a path read through the
    * chunked graft-eav connector (CSV transport standing in for REST —
    * `chunk_size` ≙ the reference's 100-id batching). */
  def readEav(spark: SparkSession, config: IniConfig): DataFrame = {
    val path = config.resolved("redcap", "eav_source")
      .getOrElse(throw new IllegalArgumentException("config: [redcap] eav_source required"))
    val chunk = config.get("redcap", "chunk_size").map(_.toInt).getOrElse(100)
    import org.apache.spark.sql.functions._
    spark.read.format("graft-eav")
      .option("path", path).option("chunk_size", chunk).load()
      .withColumn("kpmp_date_cleaned", lit(null).cast("boolean"))
      .withColumn("kpmp_date_cleaned_type", lit(null).cast("string"))
  }

  /** ConfigParser-style boolean (getboolean accepts 1/yes/true/on). */
  private def asBool(v: String): Boolean =
    Set("1", "yes", "true", "on").contains(v.trim.toLowerCase)

  /** Build the transform sequence from `[dcc_transforms]` — the reference's
    * hardcoded do_transforms ordering (redcap-etl.py:358-380): date shift,
    * then calc variables, then secondary ids, each only if configured.
    * Presence checks use `get` on the section ONLY — Python's DEFAULTSECT is
    * uppercase 'DEFAULT', so a key under our lowercase [default] must not
    * activate a transform the reference would skip; `resolved` (with its
    * interpolation + default fallback) applies only to values known present. */
  def transformsFromConfig(spark: SparkSession, config: IniConfig,
      fieldMap: DataFrame): Seq[EtlTransform] = {
    def c(k: String): Option[String] =
      config.get("dcc_transforms", k).flatMap(_ => config.resolved("dcc_transforms", k))
    val date = c("datetransform_type").map { mode =>
      new DateShiftTransform(fieldMap, mode,
        standardDate = c("standard_date").getOrElse("2010-01-01"),
        shiftSeconds = c("shifting_seconds").map(_.toLong).getOrElse(0L),
        // reference: getboolean(..., fallback=False), dcc_transforms.py:34-36
        inPlace = c("dob_shift_inplace").exists(asBool))
    }
    val calc = c("deid_data_file").map(p =>
      new CalcVariableTransform(FieldMap.load(spark, p),
        idColumn = config.resolved("redcap", "study_id_column").getOrElse("study_id"),
        // the transform's header dictionary (dcc_transforms.py:272-278)
        deidDataDictionary = c("deid_data_dictionary_file")
          .map(f => FieldMap.load(spark, f))))
    val secondary = c("secondary_id_file").map(p =>
      new SecondaryIdTransform(FieldMap.load(spark, p)))
    Seq(date, calc, secondary).flatten
  }

  /** Full run. `fake=true` (the reference's `--fake`) writes envelopes as
    * NDJSON under `out_dir` instead of POSTing; `pubDebug=true` (the
    * reference's `--pub-debug`, redcap-etl.py:28,382-397,421-422) also
    * writes the transform records pivoted wide (record × field) as a
    * single human-inspectable CSV `debug-public` under `out_dir`;
    * `writeout=Some(path)` (the reference's `-w/--writeout`,
    * redcap-etl.py:29,216-221,261-262) additionally streams every
    * transmitted chunk document — header first, then data, then
    * per-transform — into ONE NDJSON file at `path`. */
  def run(spark: SparkSession, config: IniConfig,
      projectInfo: Map[String, String] = Map.empty,
      fake: Boolean = true,
      pubDebug: Boolean = false,
      writeout: Option[String] = None): Output = {
    // S4 precondition — fail fast before any plan executes
    config.get("redcap", "project_id").foreach { expected =>
      if (projectInfo.nonEmpty) Preconditions.validateProject(expected, projectInfo)
    }
    val fieldMapPath = config.resolved("default", "field_map_file")
      .getOrElse(throw new IllegalArgumentException("config: field_map_file required"))
    val fieldMap = FieldMap.load(spark, fieldMapPath)
    val eav = readEav(spark, config)
    val transforms = transformsFromConfig(spark, config, fieldMap)
    val result = Pipeline.run(eav, fieldMap, transforms)

    val chunkRows = config.get("datalake", "chunk_rows").map(_.toInt).getOrElse(50000)
    // every chunk carries project id/type + one run timestamp, like the
    // reference's transmit() (redcap-etl.py:231-243): id from the live
    // project info when provided (get_project_info), else the config value
    val envelopeMeta: Seq[(String, Option[String])] = Seq(
      "redcap_project_id" ->
        projectInfo.get("project_id").orElse(config.get("redcap", "project_id")),
      "redcap_project_type" -> config.resolved("redcap", "project_type"),
      "extraction_run_datetime" -> Some(java.time.LocalDateTime.now().toString))
    val envelopes = Sinks.envelopes(result.kept, chunkRows, envelopeMeta)
    // per-record transform output is DATA-plane (scales with participants) —
    // it ships as its own envelope stream, never collected into the header
    val recordEnvelopes =
      result.transformRecords.map(Sinks.envelopes(_, chunkRows, envelopeMeta))
    // header = control-plane only: every transform's dictionary, plus —
    // when [redcap] include_metadata is set (getboolean fallback False,
    // redcap-etl.py:232-234) — the project metadata filtered to fields that
    // actually survived into the kept plane (filtered_metadata(), :207-214)
    val includeMetadata =
      config.get("redcap", "include_metadata").exists(asBool)
    val filteredMetadata =
      if (!includeMetadata) None
      else config.resolved("redcap", "metadata_source").map { p =>
        DictionaryJob.readMetadataJson(spark, p)
          .join(result.uniqueFields, Seq("field_name"), "left_semi")
      }
    val header = Sinks.headerDocument(result.transformMetadata, filteredMetadata)
    if (fake) {
      config.resolved("default", "out_dir").foreach { out =>
        // raw envelope documents, one per line (the reference's write_out
        // emits the chunk JSON verbatim — a json() write would re-wrap it)
        envelopes.write.mode("overwrite").text(s"$out/envelopes")
        recordEnvelopes.foreach(_.write.mode("overwrite").text(s"$out/transform_envelopes"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/header.json"), header)
      }
    }
    if (pubDebug) {
      for {
        out <- config.resolved("default", "out_dir")
        records <- result.transformRecords
      } Sinks.csvSingle(Reshape.pivotEav(records), s"$out/debug-public")
    }
    writeout.foreach { path =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      // one file, reference append order: header doc, data chunks,
      // transform chunks (a debug sink — coalesce(1) is the point)
      val tag = (df: DataFrame, o: Int) =>
        df.select(lit(o).as("o"), col(df.columns.head).as("value"))
      val all = (tag(Seq(header).toDF("value"), 0) +: tag(envelopes, 1) +:
        recordEnvelopes.map(tag(_, 2)).toSeq).reduce(_ unionByName _)
      all.coalesce(1).sortWithinPartitions("o").select("value")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
    }
    Output(result, envelopes, recordEnvelopes, header)
  }
}
