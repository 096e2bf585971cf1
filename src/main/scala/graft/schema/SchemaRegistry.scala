package graft.schema

import org.apache.spark.sql.types._

/** Table-schema catalog: the reference's YAML catalog re-expressed as a
  * `Map[String, TableSchema]` registry — no external catalog service needed;
  * `spark.read.schema(registry(t).structType).json(...)` gives the
  * "catalog-wins, missing→null, wrong-type→null" semantics of Glue's
  * `resolveChoice(match_catalog)` (reference `json_to_parquet.py:157-159`).
  */
final case class TableSchema(name: String, structType: StructType,
                             partitionKeys: Seq[String]) {
  /** Schema including partition columns (for full-table reads). */
  def fullStructType: StructType =
    StructType(structType.fields ++ partitionKeys.map(k =>
      StructField(k, StringType, nullable = true)))
}

object SchemaRegistry {

  /** Per-type logical primary key — reference `INDEX_FIELD_MAP`
    * (`/root/reference/src/glue/jobs/json_to_parquet.py:39-88`). Drives
    * dedup, delete-subtraction, child-table index inheritance and the
    * staging/main comparison join.
    */
  val indexFieldMap: Map[String, Seq[String]] = Map(
    "enrolledparticipants" -> Seq("ParticipantIdentifier"),
    "fitbitprofiles" -> Seq("ParticipantIdentifier", "ModifiedDate"),
    "fitbitdevices" -> Seq("ParticipantIdentifier", "Date", "Device"),
    "fitbitactivitylogs" -> Seq("ParticipantIdentifier", "LogId"),
    "fitbitdailydata" -> Seq("ParticipantIdentifier", "Date"),
    "fitbitecg" -> Seq("ParticipantIdentifier", "FitbitEcgKey"),
    "fitbitintradaycombined" -> Seq("ParticipantIdentifier", "Type", "DateTime"),
    "fitbitrestingheartrates" -> Seq("ParticipantIdentifier", "Date"),
    "fitbitsleeplogs" -> Seq("ParticipantIdentifier", "LogId"),
    "healthkitv2characteristics" -> Seq("ParticipantIdentifier", "HealthKitCharacteristicKey"),
    "healthkitv2samples" -> Seq("ParticipantIdentifier", "HealthKitSampleKey"),
    "healthkitv2heartbeat" -> Seq("ParticipantIdentifier", "HealthKitHeartbeatSampleKey"),
    "healthkitv2statistics" -> Seq("ParticipantIdentifier", "HealthKitStatisticKey"),
    "healthkitv2clinicalrecords" -> Seq("ParticipantIdentifier", "HealthKitClinicalRecordKey"),
    "healthkitv2electrocardiogram" -> Seq("ParticipantIdentifier", "HealthKitECGSampleKey"),
    "healthkitv2workouts" -> Seq("ParticipantIdentifier", "HealthKitWorkoutKey"),
    "healthkitv2activitysummaries" -> Seq("ParticipantIdentifier", "HealthKitActivitySummaryKey"),
    "garminactivitydetailssummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminactivitysummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminbloodpressuresummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garmindailysummary" -> Seq("ParticipantIdentifier", "StartTimeInSeconds"),
    "garminepochsummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminhealthsnapshotsummary" -> Seq("ParticipantIdentifier", "StartTimeInSeconds"),
    "garminhrvsummary" -> Seq("ParticipantIdentifier", "StartTimeInSeconds"),
    "garminmanuallyupdatedactivitysummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminmoveiqactivitysummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminpulseoxsummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminrespirationsummary" -> Seq("ParticipantIdentifier", "SummaryId"),
    "garminsleepsummary" -> Seq("ParticipantIdentifier", "StartTimeInSeconds",
      "DurationInSeconds", "Validation"),
    "garminstressdetailsummary" -> Seq("ParticipantIdentifier", "StartTimeInSeconds"),
    "garminthirdpartydailysummary" -> Seq("ParticipantIdentifier", "StartTimeInSeconds"),
    "garminusermetricssummary" -> Seq("ParticipantIdentifier", "CalenderDate"),
    "googlefitsamples" -> Seq("ParticipantIdentifier", "GoogleFitSampleKey"),
    "symptomlog" -> Seq("ParticipantIdentifier", "DataPointKey"))

  /** Data types with `*_Deleted` tombstone companions (reference routes all
    * HealthKitV2* types through delete subtraction,
    * `json_to_parquet.py:666-675`; tombstone naming `s3_to_json.py:818-822`).
    */
  def hasTombstone(dataType: String): Boolean =
    dataType.toLowerCase.startsWith("healthkitv2")

  def tombstoneName(dataType: String): String = s"${dataType}_Deleted"

  /** Parse a catalog file in the reference's YAML layout:
    *
    * {{{
    * tables:
    *   TableName:
    *     columns:
    *       - Name: Foo
    *         Type: string
    *     partition_keys:
    *       - Name: cohort
    *         Type: string
    * }}}
    *
    * Minimal purpose-built reader (the only YAML features the catalog format
    * uses are nested maps and `- key: value` lists).
    */
  def parseCatalog(yaml: String): Map[String, TableSchema] = {
    val tables = scala.collection.mutable.LinkedHashMap[String, TableSchema]()
    var table: String = null
    var section: String = null // "columns" | "partition_keys"
    var cols = Vector.empty[StructField]
    var parts = Vector.empty[String]
    var pendingName: String = null

    def flush(): Unit = if (table != null) {
      tables += table -> TableSchema(table, StructType(cols), parts)
      cols = Vector.empty; parts = Vector.empty; pendingName = null
    }

    yaml.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      val trimmed = line.trim
      if (trimmed.nonEmpty && trimmed != "tables:") {
        val indent = line.indexWhere(!_.isWhitespace)
        if (indent == 2 && trimmed.endsWith(":")) { // new table
          flush(); table = trimmed.dropRight(1); section = null
        } else if (trimmed == "columns:") section = "columns"
        else if (trimmed == "partition_keys:") section = "partition_keys"
        else if (trimmed.startsWith("- Name:")) {
          pendingName = trimmed.drop("- Name:".length).trim
        } else if (trimmed.startsWith("Type:") && pendingName != null) {
          val t = TypeParser.parse(trimmed.drop("Type:".length).trim)
          if (section == "columns") cols :+= StructField(pendingName, t, nullable = true)
          else parts :+= pendingName
          pendingName = null
        }
      }
    }
    flush()
    tables.toMap
  }
}
