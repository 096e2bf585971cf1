package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports the TestNestedDataType fixture semantics (FIXTURES.md §1; reference
  * `tests/test_json_to_parquet/TestNestedDataType_20230512.ndjson` +
  * `test_add_index_to_table`, `tests/test_json_to_parquet.py:836-907`).
  */
class RelationalizeSpec extends SparkSpec {

  private val nestedSchema = StructType(Seq(
    StructField("GlobalKey", StringType),
    StructField("ArrayOfObjectsField", ArrayType(StructType(Seq(
      StructField("filename", StringType), StructField("timestamp", StringType))))),
    StructField("ObjectField", StructType(Seq(
      StructField("filename", StringType), StructField("timestamp", StringType)))),
    StructField("export_end_date", StringType),
    StructField("cohort", StringType)))

  private def nestedDf = spark.createDataFrame(
    java.util.List.of(
      Row("g1",
        Seq(Row("f1.jpg", "t1"), Row("f2.jpg", "t2")),
        Row("obj1.jpg", "t0"), "2023-05-12T00:00:00", "adults_v1"),
      Row("g2", Seq(Row("f3.jpg", "t3")), Row("obj2.jpg", "t9"),
        "2023-05-12T00:00:00", "pediatric_v1")),
    nestedSchema)

  test("structs flatten to underscore names; arrays become child tables") {
    val tables = Relationalize(nestedDf, "testnesteddatatype", Seq("GlobalKey", "cohort"))
    assert(tables.keySet === Set("testnesteddatatype", "testnesteddatatype_arrayofobjectsfield"))

    val parent = tables("testnesteddatatype")
    assert(parent.columns.toSet === Set("GlobalKey", "ObjectField_filename",
      "ObjectField_timestamp", "export_end_date", "cohort"))
    assert(parent.count() === 2)

    val child = tables("testnesteddatatype_arrayofobjectsfield")
    assert(child.columns.toSet === Set("GlobalKey", "cohort", "index", "filename", "timestamp"))
    val rows = child.collect().map(r =>
      (r.getAs[String]("GlobalKey"), r.getAs[Int]("index"), r.getAs[String]("filename"))).toSet
    assert(rows === Set(("g1", 0, "f1.jpg"), ("g1", 1, "f2.jpg"), ("g2", 0, "f3.jpg")))
  }

  test("child column colliding with carry key gets the longer prefixed name") {
    val schema = StructType(Seq(
      StructField("GlobalKey", StringType),
      StructField("Items", ArrayType(StructType(Seq(
        StructField("GlobalKey", StringType), StructField("v", StringType)))))))
    val df = spark.createDataFrame(
      java.util.List.of(Row("g1", Seq(Row("inner", "x")))), schema)
    val child = Relationalize(df, "t", Seq("GlobalKey"))("t_items")
    // carried parent key keeps its name; element field renamed Items_GlobalKey
    assert(child.columns.toSet === Set("GlobalKey", "index", "Items_GlobalKey", "v"))
    val r = child.collect().head
    assert(r.getAs[String]("GlobalKey") === "g1")
    assert(r.getAs[String]("Items_GlobalKey") === "inner")
  }

  test("array nested inside a struct produces a dotted-path child (symptomlog shape)") {
    val schema = StructType(Seq(
      StructField("DataPointKey", StringType),
      StructField("Value", StructType(Seq(
        StructField("notes", StringType),
        StructField("symptoms", ArrayType(StructType(Seq(
          StructField("id", StringType), StructField("severity", IntegerType))))))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row("d1", Row("n", Seq(Row("s1", 2), Row("s2", 3))))), schema)
    val tables = Relationalize(df, "symptomlog", Seq("DataPointKey"))
    assert(tables.contains("symptomlog_value_symptoms"))
    val child = tables("symptomlog_value_symptoms")
    assert(child.columns.toSet === Set("DataPointKey", "index", "id", "severity"))
    assert(child.count() === 2)
    val parent = tables("symptomlog")
    assert(parent.columns.toSet === Set("DataPointKey", "Value_notes"))
  }

  test("array of scalars yields {path}_val column") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("Samples", ArrayType(IntegerType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row("a", Seq(7, 8))), schema)
    val child = Relationalize(df, "t", Seq("id"))("t_samples")
    assert(child.columns.toSet === Set("id", "index", "Samples_val"))
    assert(child.count() === 2)
  }

  test("row multiplicity: child rows equal total array elements; empty arrays kept as null row") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("xs", ArrayType(IntegerType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row("a", Seq(1, 2, 3)), Row("b", Seq.empty[Int]), Row("c", null)),
      schema)
    val child = Relationalize(df, "t", Seq("id"))("t_xs")
    // posexplode_outer keeps parent presence for empty/null arrays
    assert(child.count() === 5)
    assert(child.where("xs_val IS NOT NULL").count() === 3)
  }

  test("array of arrays recurses to a doubly-indexed grandchild") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("Matrix", ArrayType(ArrayType(IntegerType)))))
    val df = spark.createDataFrame(
      java.util.List.of(Row("a", Seq(Seq(1, 2), Seq(3)))), schema)
    val tables = Relationalize(df, "t", Seq("id"))
    val grand = tables("t_matrix_val")
    assert(grand.columns.toSet === Set("id", "index", "index_2", "Matrix_val_val"))
    val rows = grand.collect().map(r => (r.getAs[Int]("index"),
      r.getAs[Int]("index_2"), r.getAs[Int]("Matrix_val_val"))).toSet
    assert(rows === Set((0, 0, 1), (0, 1, 2), (1, 0, 3)))
  }

  test("hasNestedFields") {
    assert(Relationalize.hasNestedFields(nestedSchema))
    assert(!Relationalize.hasNestedFields(StructType(Seq(StructField("a", StringType)))))
  }

  test("parent names: struct path flattening to an existing literal column uniquifies") {
    // struct a{b} flattens to a_b — which the input ALSO has literally;
    // duplicate output names would make the parent table unwritable
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", IntegerType)))),
      StructField("a_b", IntegerType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row(1), 2)), schema)
    val parent = Relationalize(df, "t", Seq.empty)("t")
    assert(parent.columns.toSeq === Seq("a_b", "a_b_2"))
    val row = parent.collect().head
    assert(row.getAs[Int]("a_b") === 1)   // first occurrence (schema order) keeps the short name
    assert(row.getAs[Int]("a_b_2") === 2)
  }
}
