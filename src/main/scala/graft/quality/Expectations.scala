package graft.quality

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Declarative range/existence validation — the reference's Great
  * Expectations layer re-expressed as one Spark aggregation pass.
  *
  * Reference semantics: `run_great_expectations_on_parquet.py:223-277` with
  * suites in `src/glue/resources/data_values_expectations.json` —
  * `expect_column_values_to_be_between` (27 physiological range rules) and
  * `expect_column_to_exist`. A rule yields pass/fail plus the count of
  * unexpected values; nulls are not counted as unexpected (GE's default
  * `mostly`-less semantics ignore nulls for `between`).
  *
  * Scale notes: all Between rules for a table fold into a single `agg(...)`
  * over one scan — N rules cost one job, not N — and the projected column set
  * is pruned to exactly the validated columns.
  */
object Expectations {

  sealed trait Expectation { def column: String; def name: String }
  final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
    val name = "expect_column_values_to_be_between"
  }
  final case class ColumnExists(column: String) extends Expectation {
    val name = "expect_column_to_exist"
  }

  final case class Result(expectation: String, column: String,
                          unexpectedCount: Long, passed: Boolean)

  /** Run all expectations in a single pass; `ColumnExists` is resolved from
    * the schema without touching data.
    */
  def run(df: DataFrame, rules: Seq[Expectation]): Seq[Result] = {
    val (existRules, betweenRules) = rules.partition(_.isInstanceOf[ColumnExists])
    val existResults = existRules.map { r =>
      val ok = df.columns.contains(r.column)
      Result(r.name, r.column, if (ok) 0L else 1L, ok)
    }
    val applicable = betweenRules.collect {
      case b: Between if df.columns.contains(b.column) => b
    }
    val inapplicable = betweenRules.collect {
      case b: Between if !df.columns.contains(b.column) =>
        Result(b.name, b.column, 0L, passed = false)
    }
    val betweenResults = if (applicable.isEmpty) Nil else {
      val aggs: Seq[Column] = applicable.zipWithIndex.map { case (b, i) =>
        sum(when(col(b.column).isNotNull &&
          (col(b.column) < lit(b.lo) || col(b.column) > lit(b.hi)), 1L)
          .otherwise(0L)).as(s"u_$i")
      }
      val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
      applicable.zipWithIndex.map { case (b, i) =>
        val u = if (row.isNullAt(i)) 0L else row.getLong(i)
        Result(b.name, b.column, u, u == 0L)
      }
    }
    existResults ++ betweenResults ++ inapplicable
  }

  /** Parse a Great-Expectations-style suite config (the reference's
    * `data_values_expectations.json` shape,
    * `run_great_expectations_on_parquet.py:223-277`): a JSON object mapping
    * data type → `{"expectations": [{"expectation_type": ..., "kwargs":
    * {"column": ..., "min_value": ..., "max_value": ...}}]}`. Unknown
    * expectation types raise — a silently dropped rule is a validation hole.
    */
  def fromJson(json: String): Map[String, Seq[Expectation]] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(json)
    root.properties().asScala.map { e =>
      val rules = Option(e.getValue.get("expectations")).toSeq
        .flatMap(_.elements().asScala)
        .map { r =>
          val kind = r.get("expectation_type").asText()
          val kw = r.get("kwargs")
          kind match {
            case "expect_column_values_to_be_between" =>
              // GE allows one-sided bounds: a missing or null bound is open
              def bound(name: String, default: Double): Double =
                Option(kw.get(name)).filterNot(_.isNull).map(_.asDouble()).getOrElse(default)
              Between(kw.get("column").asText(),
                bound("min_value", Double.NegativeInfinity),
                bound("max_value", Double.PositiveInfinity))
            case "expect_column_to_exist" =>
              ColumnExists(kw.get("column").asText())
            case other =>
              throw new IllegalArgumentException(s"unsupported expectation_type: $other")
          }
        }
      e.getKey -> rules
    }.toMap
  }

  /** Render a validation run to data-docs artifacts (the reference renders
    * GE result docs to S3, `run_great_expectations_on_parquet.py:255-277`):
    * a machine-readable `results.json` and a self-contained human
    * `index.html`, written through the Hadoop FS API so any scheme works.
    * Returns (jsonPath, htmlPath). `runLabel` identifies the run (caller
    * supplies a timestamp/run id — kept explicit for reproducible tests).
    */
  def renderDocs(spark: org.apache.spark.sql.SparkSession, suiteName: String,
                 runLabel: String, results: Seq[Result],
                 outDir: String): (String, String) = {
    val overall = results.forall(_.passed)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("suite", suiteName)
    rootNode.put("run", runLabel)
    rootNode.put("success", overall)
    val arr = rootNode.putArray("results")
    results.foreach { r =>
      val n = arr.addObject()
      n.put("expectation", r.expectation)
      n.put("column", r.column)
      n.put("unexpected_count", r.unexpectedCount)
      n.put("passed", r.passed)
    }
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(rootNode)

    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val rows = results.map { r =>
      val cls = if (r.passed) "pass" else "fail"
      s"""<tr class="$cls"><td>${esc(r.expectation)}</td><td>${esc(r.column)}</td>""" +
        s"""<td>${r.unexpectedCount}</td><td>${if (r.passed) "PASS" else "FAIL"}</td></tr>"""
    }.mkString("\n")
    val html =
      s"""<!doctype html><html><head><meta charset="utf-8">
         |<title>${esc(suiteName)} — validation</title><style>
         |body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
         |td,th{border:1px solid #ccc;padding:4px 10px}
         |tr.pass td{background:#eaffea}tr.fail td{background:#ffeaea}
         |</style></head><body>
         |<h1>${esc(suiteName)}</h1>
         |<p>run ${esc(runLabel)} — overall ${if (overall) "PASS" else "FAIL"}
         |(${results.count(_.passed)}/${results.size} expectations)</p>
         |<table><tr><th>expectation</th><th>column</th>
         |<th>unexpected</th><th>status</th></tr>
         |$rows
         |</table></body></html>""".stripMargin

    val (fs, dir) = graft.pipeline.Snapshots.fsFor(spark, outDir)
    fs.mkdirs(dir)
    def write(name: String, content: String): String = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val out = fs.create(p, true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      p.toString
    }
    (write("results.json", json), write("index.html", html))
  }

  /** Same validation as a lazy DataFrame (for SQL-oracle checking): one row
    * per Between rule with the unexpected count — stays distributed, no
    * driver collect.
    */
  def betweenReport(df: DataFrame, rules: Seq[Between]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (rules.isEmpty)
      // run() tolerates an empty rule list; the report must too
      return Seq.empty[(String, Double, Double, Long, Boolean)]
        .toDF("column_name", "lo", "hi", "unexpected_count", "passed")
    // index-suffixed aliases: two Between rules on the SAME column are
    // legal in run(), and bare column-name aliases would make the stack
    // references ambiguous
    val aggs = rules.zipWithIndex.map { case (b, i) =>
      sum(when(col(b.column).isNotNull &&
        (col(b.column) < lit(b.lo) || col(b.column) > lit(b.hi)), 1L)
        .otherwise(0L)).as(s"__r$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (column, unexpected_count, passed); infinite bounds (from
    // one-sided GE rules) have no bare SQL literal — cast from string
    def dlit(x: Double): String =
      if (x.isInfinite || x.isNaN) s"CAST('$x' AS DOUBLE)" else s"${x}D"
    val stacked = rules.zipWithIndex.map { case (b, i) =>
      s"'${b.column}', ${dlit(b.lo)}, ${dlit(b.hi)}, `__r$i`" }.mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stacked) as (column_name, lo, hi, unexpected_count)")
      .withColumn("passed", col("unexpected_count") === 0L)
  }
}
