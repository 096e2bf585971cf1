package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench emission contract: the driver recovers only a ~2000-char
  * log tail, so every stdout line must be individually short and the
  * final summary line must fit the tail with room for the sbt epilogue.
  * These are pure-JVM checks — no Spark session. */
class BenchEmitSpec extends AnyFunSuite {

  private val allNames = SparkEntry.queries.keys.toSeq

  test("headline subset names all exist in SparkEntry.queries") {
    val missing = Bench.Headline.filterNot(allNames.contains)
    assert(missing.isEmpty, s"headline names missing from queries: $missing")
  }

  test("summary line stays well inside the driver's log-tail window") {
    // worst case: every query present, every time a 4-dp double
    val results = allNames.map(n => n -> 123.4567)
    val line = Bench.summaryLine(results, "/root/testdata/sf0.1", 3,
      Seq(12.34, 11.1, 9.99), "/root/repo/target/bench.json")
    assert(line.length < 1500,
      s"summary line ${line.length} chars risks the ~2000-char tail clip")
    assert(!line.contains("\n"))
    // shape: the documented one-JSON-line contract fields
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"queries\":{", "\"sf\":", "\"reps\":", "\"loadavg\":[", "\"host\":"))
      assert(line.contains(k), s"summary line missing $k")
  }

  test("per-query lines are short and carry min + all reps + cold") {
    val l = Bench.perQueryLine("q153_passage_neardup",
      Seq(5.0123456789, 4.98765, 5.1), 42.987654)
    // rint = round-half-even: 49876.5 -> 49876
    assert(l === """{"q":"q153_passage_neardup","s":4.9876,"reps":[5.0123,4.9876,5.1],"cold_s":42.9877}""")
    assert(l.length < 200)
    // a failed rep forces the min to the -1 failure sentinel
    assert(Bench.perQueryLine("x", Seq(1.0, -1.0), 1.0).contains("\"s\":-1"))
  }

  test("full json carries every query, rep detail, cold pass and loadavgs") {
    val res = Seq("a" -> 1.0, "b" -> 2.0)
    val det = Seq("a" -> Seq(1.0, 1.5), "b" -> Seq(2.0, 2.5))
    val j = Bench.fullJson(res, det, "sf", 2, Seq(0.1), Seq(0.2),
      Seq("a" -> 9.5, "b" -> 0.9))
    assert(j.contains("\"queries\":{\"a\":1.0,\"b\":2.0}"))
    assert(j.contains("\"reps_detail\":{\"a\":[1.0,1.5],\"b\":[2.0,2.5]}"))
    assert(j.contains("\"cold_s\":{\"a\":9.5,\"b\":0.9}"))
    assert(j.contains("\"loadavg_before\":[0.1]"))
    assert(j.contains("\"loadavg_after\":[0.2]"))
    assert(j.contains("\"value\":3.0"))
  }

  test("loadavg reads three non-negative values on linux") {
    // loadAvg() documents (and returns) empty off-Linux — only assert
    // the 3-field shape where /proc/loadavg actually exists
    assume(new java.io.File("/proc/loadavg").exists)
    val la = Bench.loadAvg()
    assert(la.size === 3)
    assert(la.forall(_ >= 0))
  }
}
