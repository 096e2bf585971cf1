package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Per-type Garmin map-pivot configuration (reference
  * `s3_to_json.py:217-251`): which fields arrive as `{"offset": value}` JSON
  * objects and what key/value struct fields they pivot into (T5). Keys are
  * (dataType, fieldPath); `Summaries.EpochSummaries`-style nested paths use
  * the two-level variant.
  */
object GarminPivots {

  final case class PivotSpec(field: String, nestedIn: Option[String],
                             keyName: String, keyType: String,
                             valueName: String, valueType: String)

  val specs: Map[String, Seq[PivotSpec]] = Map(
    "GarminDailySummary" -> Seq(
      PivotSpec("TimeOffsetHeartRateSamples", None, "OffsetInSeconds", "int", "HeartRate", "int")),
    "GarminActivityDetailsSummary" -> Seq(
      PivotSpec("Samples", None, "OffsetInSeconds", "int", "Value", "double")),
    "GarminHrvSummary" -> Seq(
      PivotSpec("HrvValues", None, "OffsetInSeconds", "int", "Hrv", "double")),
    "GarminPulseOxSummary" -> Seq(
      PivotSpec("TimeOffsetSpo2Values", None, "OffsetInSeconds", "int", "Spo2", "int")),
    "GarminRespirationSummary" -> Seq(
      PivotSpec("TimeOffsetEpochToBreaths", None, "OffsetInSeconds", "int", "Breaths", "double")),
    "GarminStressDetailSummary" -> Seq(
      PivotSpec("TimeOffsetStressLevelValues", None, "OffsetInSeconds", "int", "StressLevel", "int"),
      PivotSpec("TimeOffsetBodyBatteryValues", None, "OffsetInSeconds", "int", "BodyBattery", "int")),
    "GarminHealthSnapshotSummary" -> Seq(
      PivotSpec("EpochSummaries", Some("Summaries"), "OffsetInSeconds", "int", "Value", "double")),
    "GarminSleepSummary" -> Seq(
      PivotSpec("TimeOffsetSleepSpo2", None, "OffsetInSeconds", "int", "Spo2", "int"),
      PivotSpec("TimeOffsetSleepRespiration", None, "OffsetInSeconds", "int", "Breaths", "double")))

  /** Apply all configured pivots for a data type (no-op for others). */
  def apply(dataType: String, df: DataFrame): DataFrame =
    specs.getOrElse(dataType, Nil).foldLeft(df) { (d, spec) =>
      spec.nestedIn match {
        case None if d.columns.contains(spec.field) =>
          d.withColumn(spec.field, Transforms.objectToArrayOfStructs(
            col(spec.field), spec.keyName, spec.keyType, spec.valueName, spec.valueType))
        case Some(outer) if d.columns.contains(outer) =>
          d.withColumn(outer, Transforms.objectToArrayOfStructsNested(
            col(outer), spec.field, spec.keyName, spec.keyType,
            spec.valueName, spec.valueType))
        case _ => d
      }
    }
}
