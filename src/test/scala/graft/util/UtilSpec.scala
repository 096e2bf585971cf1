package graft.util

import graft.sinks.SqlDdl
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class UtilSpec extends AnyFunSuite {

  test("deep merge: right wins on conflict, maps merge recursively") {
    val x = Map("a" -> 1, "ctx" -> Map("job" -> "j1", "keep" -> true))
    val y = Map("b" -> 2, "ctx" -> Map("job" -> "j2"))
    val m = Merge.deepMerge(x, y)
    assert(m("a") === 1 && m("b") === 2)
    assert(m("ctx") === Map("job" -> "j2", "keep" -> true))
  }

  test("ddl: all-varchar table with flattened struct columns + copy into") {
    val schema = StructType(Seq(
      StructField("ParticipantIdentifier", StringType),
      StructField("AverageHeartRate", IntegerType),
      StructField("Source", StructType(Seq(StructField("Name", StringType))))))
    val ddl = SqlDdl.allVarcharTable("healthkitv2electrocardiogram", schema)
    assert(ddl.contains(""""ParticipantIdentifier" VARCHAR"""))
    assert(ddl.contains(""""Source_Name" VARCHAR"""))
    assert(SqlDdl.typedTable("t", schema).contains(""""AverageHeartRate" INTEGER"""))
    assert(SqlDdl.copyInto("t", "@stage/t").contains("MATCH_BY_COLUMN_NAME = CASE_SENSITIVE"))
  }
}
