package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeParserSpec extends AnyFunSuite {

  test("primitives") {
    assert(TypeParser.parse("string") === StringType)
    assert(TypeParser.parse("int") === IntegerType)
    assert(TypeParser.parse("double") === DoubleType)
    assert(TypeParser.parse("boolean") === BooleanType)
  }

  test("nested struct/array grammar from the reference catalog") {
    val t = TypeParser.parse(
      "array<struct<MicroVolts:double,TimeSinceSampleStart:double>>")
    assert(t === ArrayType(StructType(Seq(
      StructField("MicroVolts", DoubleType),
      StructField("TimeSinceSampleStart", DoubleType))), containsNull = true))
  }

  test("three-level nesting round-trips through render") {
    val s = "struct<CustomFields:struct<Symptoms:array<struct<id:string,name:string,inactive:boolean>>,EOPReason:int>,UtcOffset:string>"
    assert(TypeParser.render(TypeParser.parse(s)) === s)
  }

  test("map type for Garmin offset objects") {
    assert(TypeParser.parse("map<string,int>") ===
      MapType(StringType, IntegerType, valueContainsNull = true))
  }

  test("catalog YAML parses tables, columns and partition keys") {
    val yaml =
      """tables:
        |  TestFlatDataType:
        |    columns:
        |      - Name: GlobalKey
        |        Type: string
        |      - Name: export_end_date
        |        Type: string
        |    partition_keys:
        |      - Name: cohort
        |        Type: string
        |  TestNestedDataType:
        |    columns:
        |      - Name: GlobalKey
        |        Type: string
        |      - Name: ArrayOfObjectsField
        |        Type: array<struct<filename:string,timestamp:string>>
        |    partition_keys:
        |      - Name: cohort
        |        Type: string
        |""".stripMargin
    val cat = SchemaRegistry.parseCatalog(yaml)
    assert(cat.keySet === Set("TestFlatDataType", "TestNestedDataType"))
    assert(cat("TestFlatDataType").partitionKeys === Seq("cohort"))
    assert(cat("TestNestedDataType").structType("ArrayOfObjectsField").dataType
      .isInstanceOf[ArrayType])
    assert(cat("TestFlatDataType").fullStructType.fieldNames.contains("cohort"))
  }

  test("index field map sanity") {
    assert(SchemaRegistry.indexFieldMap("healthkitv2electrocardiogram") ===
      Seq("ParticipantIdentifier", "HealthKitECGSampleKey"))
    assert(SchemaRegistry.indexFieldMap("garminsleepsummary").length === 4)
    assert(SchemaRegistry.hasTombstone("HealthKitV2Samples"))
    assert(!SchemaRegistry.hasTombstone("FitbitSleepLogs"))
  }
}
