package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Per-record ingest transforms T1–T6 (reference `s3_to_json.py`), as
  * `DataFrame => DataFrame` stages built from Catalyst expressions — the
  * row-at-a-time Python generators become codegen'd narrow projections.
  */
object Transforms {

  /** T1 — universal-property injection (`s3_to_json.py:261-288`): stamp
    * every record with export window + cohort from file/path metadata.
    */
  def withUniversalProperties(df: DataFrame, exportStartDate: Option[String],
                              exportEndDate: String, cohort: String): DataFrame =
    df.withColumn("export_start_date",
        exportStartDate.map(lit(_)).getOrElse(lit(null).cast("string")))
      .withColumn("export_end_date", lit(exportEndDate))
      .withColumn("cohort", lit(cohort))

  /** T2 — subtype re-injection (`s3_to_json.py:203-205`): the four HealthKit
    * sample/statistics types carry their filename-derived subtype in `Type`.
    */
  val subtypeInjectedTypes: Set[String] = Set(
    "HealthKitV2Samples", "HealthKitV2Statistics",
    "HealthKitV2Samples_Deleted", "HealthKitV2Statistics_Deleted")

  def withSubtype(df: DataFrame, subtype: String): DataFrame =
    df.withColumn("Type", lit(subtype))

  /** T3 — JSON-string → struct parse (`s3_to_json.py:206-208`): SymptomLog's
    * `Value` arrives as a JSON *string*; parse to the declared struct.
    * Malformed input → null (from_json PERMISSIVE default).
    */
  def parseJsonStringColumn(df: DataFrame, column: String, schema: DataType): DataFrame =
    df.withColumn(column, from_json(col(column).cast("string"), schema))

  /** T4 — stringified-array repair (`_cast_custom_fields_to_array`,
    * `s3_to_json.py:291-348`): a field that should be `array<struct<...>>`
    * may arrive as a JSON string, possibly *double*-escaped (a JSON string
    * containing JSON), possibly empty/malformed → `[]`.
    *
    * Pure-expression double-unescape: wrap the value in `{"v": <raw>}` and
    * parse with a string-typed field — `from_json` then performs exactly one
    * level of JSON string decoding; a second `from_json` parses the decoded
    * payload. No UDF.
    */
  def repairStringifiedArray(df: DataFrame, column: Column, elementSchema: DataType,
                             out: String): DataFrame = {
    val arrType = ArrayType(elementSchema, containsNull = true)
    val direct = from_json(column.cast("string"), arrType)
    val unescaped = from_json(
      concat(lit("{\"v\":"), column.cast("string"), lit("}")),
      StructType(Seq(org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))).getField("v")
    val doubleParsed = from_json(unescaped, arrType)
    df.withColumn(out,
      coalesce(direct, doubleParsed, array().cast(arrType)))
  }

  /** T5 — object → array-of-structs pivot (`transform_object_to_array_of_objects`,
    * `s3_to_json.py:40-116,217-251`): Garmin time-offset maps
    * `{"0": 62, ...}` become `[{OffsetInSeconds: 0, HeartRate: 62}, ...]`.
    * Cast failures → null entries (try_cast semantics = Spark ANSI-off cast).
    * The column must be read as `map<string,string>` (declare MapType in the
    * read schema).
    */
  def objectToArrayOfStructs(mapCol: Column, keyName: String, keyType: String,
                             valueName: String, valueType: String): Column =
    transform(map_entries(mapCol), e => struct(
      e.getField("key").try_cast(keyType).as(keyName),
      e.getField("value").try_cast(valueType).as(valueName)))

  /** T5, two-level variant (`Summaries.EpochSummaries`): pivot a map field
    * inside each element of an outer array of structs.
    */
  def objectToArrayOfStructsNested(outerArray: Column, innerField: String,
                                   keyName: String, keyType: String,
                                   valueName: String, valueType: String): Column =
    transform(outerArray, elem =>
      elem.withField(innerField,
        objectToArrayOfStructs(elem.getField(innerField),
          keyName, keyType, valueName, valueType)))

  /** T6 — filename → metadata parse (`get_metadata`, `s3_to_json.py:788-822`):
    * `{Type}[_{Subtype}][_Deleted]_{YYYYMMDD}[-{YYYYMMDD}].json`.
    * A single date is the export end; a range is start-end.
    */
  final case class FileMetadata(dataType: String, subtype: Option[String],
                                isDeleted: Boolean, startDate: Option[String],
                                endDate: String) {
    /** Routing name: deleted HealthKit types land in `{type}_Deleted` (T9). */
    def routedType: String = if (isDeleted) s"${dataType}_Deleted" else dataType
  }

  private val fileRe =
    """^([A-Za-z0-9]+?)(?:_([A-Za-z][A-Za-z0-9]*?))??(_Deleted)?_(\d{8})(?:-(\d{8}))?\.json$""".r

  def parseFileName(name: String): Option[FileMetadata] = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    base match {
      case fileRe(t, sub, del, d1, d2) =>
        val (start, end) = if (d2 == null) (None, d1) else (Some(d1), d2)
        Some(FileMetadata(t, Option(sub), del != null,
          start.map(fmtDate), fmtDate(end)))
      case _ => None
    }
  }

  private def fmtDate(yyyymmdd: String): String =
    s"${yyyymmdd.substring(0, 4)}-${yyyymmdd.substring(4, 6)}-${yyyymmdd.substring(6, 8)}"
}
