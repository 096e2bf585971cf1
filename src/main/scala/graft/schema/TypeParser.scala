package graft.schema

import org.apache.spark.sql.types._

/** Parser for the reference catalog's type grammar
  * (`/root/reference/src/glue/resources/table_columns.yaml`):
  *
  * {{{ type := string | int | double | boolean | float | long
  *           | struct<name:type,...> | array<type> | map<type,type> }}}
  *
  * Recursive descent; names inside struct<> may contain any character except
  * `:`/`,`/`<`/`>`.
  */
object TypeParser {

  def parse(s: String): DataType = {
    val (t, rest) = parseType(s.trim)
    require(rest.trim.isEmpty, s"trailing input '$rest' parsing type '$s'")
    t
  }

  private def parseType(s: String): (DataType, String) = {
    if (s.startsWith("struct<")) {
      var rest = s.drop("struct<".length)
      val fields = Seq.newBuilder[StructField]
      while (!rest.startsWith(">")) {
        val colon = rest.indexOf(':')
        require(colon > 0, s"expected 'name:type' at '$rest'")
        val name = rest.substring(0, colon)
        val (t, r2) = parseType(rest.substring(colon + 1))
        fields += StructField(name.trim, t, nullable = true)
        rest = if (r2.startsWith(",")) r2.drop(1) else r2
      }
      (StructType(fields.result()), rest.drop(1))
    } else if (s.startsWith("array<")) {
      val (t, rest) = parseType(s.drop("array<".length))
      require(rest.startsWith(">"), s"expected '>' at '$rest'")
      (ArrayType(t, containsNull = true), rest.drop(1))
    } else if (s.startsWith("map<")) {
      val (k, r1) = parseType(s.drop("map<".length))
      require(r1.startsWith(","), s"expected ',' at '$r1'")
      val (v, r2) = parseType(r1.drop(1))
      require(r2.startsWith(">"), s"expected '>' at '$r2'")
      (MapType(k, v, valueContainsNull = true), r2.drop(1))
    } else {
      val end = s.indexWhere(c => c == ',' || c == '>')
      val (name, rest) = if (end < 0) (s, "") else (s.substring(0, end), s.substring(end))
      val t = name.trim match {
        case "string" => StringType
        case "int" | "integer" => IntegerType
        case "long" | "bigint" => LongType
        case "double" => DoubleType
        case "float" => FloatType
        case "boolean" => BooleanType
        case other => throw new IllegalArgumentException(s"unknown type '$other'")
      }
      (t, rest)
    }
  }

  /** Render a DataType back into the catalog grammar (inverse of parse). */
  def render(t: DataType): String = t match {
    case StringType => "string"
    case IntegerType => "int"
    case LongType => "long"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case ArrayType(e, _) => s"array<${render(e)}>"
    case MapType(k, v, _) => s"map<${render(k)},${render(v)}>"
    case st: StructType =>
      st.fields.map(f => s"${f.name}:${render(f.dataType)}").mkString("struct<", ",", ">")
    case other => throw new IllegalArgumentException(s"cannot render $other")
  }
}
