package graft.ingest

import graft.SparkSpec
import graft.schema.TypeParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("T1: universal properties injected; null start date allowed") {
    val df = Seq(("a")).toDF("x")
    val out = Transforms.withUniversalProperties(df, None, "2023-05-12T00:00:00", "adults_v1")
    val r = out.collect().head
    assert(r.getAs[String]("export_start_date") == null)
    assert(r.getAs[String]("export_end_date") === "2023-05-12T00:00:00")
    assert(r.getAs[String]("cohort") === "adults_v1")
  }

  test("T3: JSON-string column parses to struct; malformed -> null") {
    val schema = TypeParser.parse(
      "struct<symptoms:array<struct<id:string,severity:int>>,notes:string>")
    val df = Seq(
      ("""{"symptoms":[{"id":"s1","severity":2}],"notes":"n"}"""),
      ("""not json""")).toDF("Value")
    val out = Transforms.parseJsonStringColumn(df, "Value", schema).collect()
    assert(out(0).getStruct(0).getAs[String]("notes") === "n")
    // Spark 4 PERMISSIVE from_json yields an all-null struct on malformed input
    val bad = out(1).getStruct(0)
    assert(bad == null || (bad.isNullAt(0) && bad.isNullAt(1)))
  }

  test("T4: stringified array repaired; double-escaped parsed; malformed -> []") {
    val elem = TypeParser.parse("struct<id:string,inactive:boolean>")
    val df = Seq(
      """[{"id":"a","inactive":false}]""", // plain JSON string content
      "\"[{\\\"id\\\":\\\"b\\\",\\\"inactive\\\":true}]\"", // double-escaped
      "", // empty -> []
      "garbage{{" // malformed -> []
    ).toDF("CustomFields")
    val out = Transforms.repairStringifiedArray(df, col("CustomFields"), elem, "repaired")
      .select("repaired").collect()
    assert(out(0).getSeq[org.apache.spark.sql.Row](0).map(_.getString(0)) === Seq("a"))
    assert(out(1).getSeq[org.apache.spark.sql.Row](0).map(_.getString(0)) === Seq("b"))
    assert(out(2).getSeq[org.apache.spark.sql.Row](0).isEmpty)
    assert(out(3).getSeq[org.apache.spark.sql.Row](0).isEmpty)
  }

  test("T5: object pivots to array of structs; cast failure -> null value") {
    val df = Seq((Map("0" -> "62", "30" -> "63", "x" -> "oops"))).toDF("HeartRate")
    val out = df.select(Transforms.objectToArrayOfStructs(
      col("HeartRate"), "OffsetInSeconds", "int", "HeartRate", "int").as("a"))
    val rows = out.selectExpr("explode(a) e").select("e.OffsetInSeconds", "e.HeartRate")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(rows === Set((Some(0), Some(62)), (Some(30), Some(63)), (None, None)))
  }

  test("Garmin pivot config applies T5 per data type (incl. nested path)") {
    import graft.ingest.GarminPivots
    val df = Seq((Map("0" -> "62", "30" -> "63"))).toDF("TimeOffsetHeartRateSamples")
    val out = GarminPivots("GarminDailySummary", df)
    val rows = out.selectExpr("explode(TimeOffsetHeartRateSamples) e")
      .select("e.OffsetInSeconds", "e.HeartRate").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows === Set((0, 62), (30, 63)))
    // unconfigured type: no-op
    assert(GarminPivots("FitbitSleepLogs", df).schema === df.schema)
  }

  test("T6: filename metadata parse") {
    val m1 = Transforms.parseFileName("FitbitIntradayCombined_20230512.json").get
    assert(m1.dataType === "FitbitIntradayCombined" && m1.subtype.isEmpty)
    assert(!m1.isDeleted && m1.startDate.isEmpty && m1.endDate === "2023-05-12")

    val m2 = Transforms.parseFileName("HealthKitV2Samples_Weight_20230510-20230512.json").get
    assert(m2.dataType === "HealthKitV2Samples" && m2.subtype === Some("Weight"))
    assert(m2.startDate === Some("2023-05-10") && m2.endDate === "2023-05-12")

    val m3 = Transforms.parseFileName("HealthKitV2Samples_Weight_Deleted_20230512.json").get
    assert(m3.isDeleted && m3.routedType === "HealthKitV2Samples_Deleted")

    assert(Transforms.parseFileName("Manifest.json").isEmpty)
    assert(Transforms.parseFileName("owner.txt").isEmpty)
  }
}
