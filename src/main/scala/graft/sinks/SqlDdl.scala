package graft.sinks

import org.apache.spark.sql.types._

/** External-warehouse contract generator (reference S11: the Snowflake
  * mirror's per-table DDL + COPY INTO scripts,
  * `/root/reference/snowflake/objects/.../copy_into_table_from_stage.sql:17-36`
  * and the per-table `..._parquet.sql` DDL under `snowflake/objects/`).
  *
  * The reference's consumption tables are all-VARCHAR with case-sensitive
  * column-name matching from Parquet; we generate equivalent ANSI DDL so
  * Parquet remains the engine contract and any warehouse can mirror it.
  */
object SqlDdl {

  /** All-VARCHAR landing table, reference-style (`{name}_parquet`). */
  def allVarcharTable(name: String, schema: StructType): String = {
    val cols = flatten(schema).map { case (col, _) => s"""  "$col" VARCHAR""" }
    s"""CREATE TABLE IF NOT EXISTS ${name}_parquet (
       |${cols.mkString(",\n")}
       |);""".stripMargin
  }

  /** Typed DDL variant preserving engine types. */
  def typedTable(name: String, schema: StructType): String = {
    val cols = flatten(schema).map { case (col, t) => s"""  "$col" ${sqlType(t)}""" }
    s"""CREATE TABLE IF NOT EXISTS $name (
       |${cols.mkString(",\n")}
       |);""".stripMargin
  }

  /** COPY-from-stage statement with case-sensitive name matching, mirroring
    * the reference's loading procedure.
    */
  def copyInto(name: String, stagePath: String): String =
    s"""COPY INTO ${name}_parquet
       |FROM '$stagePath'
       |FILE_FORMAT = (TYPE = PARQUET)
       |MATCH_BY_COLUMN_NAME = CASE_SENSITIVE;""".stripMargin

  /** Nested columns land flattened with underscore names — matching how the
    * pipeline's relationalize writes them.
    */
  private def flatten(schema: StructType, prefix: String = ""): Seq[(String, DataType)] =
    schema.fields.toIndexedSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => flatten(st, s"$prefix${f.name}_")
        case t => Seq((s"$prefix${f.name}", t))
      }
    }

  private def sqlType(t: DataType): String = t match {
    case StringType => "VARCHAR"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case _: ArrayType | _: MapType => "VARIANT"
    case TimestampType => "TIMESTAMP"
    case other => throw new IllegalArgumentException(s"no SQL mapping for $other")
  }
}
