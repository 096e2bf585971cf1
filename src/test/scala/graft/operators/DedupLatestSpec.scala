package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ports the reference's dedup fixtures
  * (`tests/test_json_to_parquet.py:66-106,766-816` via FIXTURES.md §2).
  */
class DedupLatestSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("John", 25, "New York", "1", "2023-05-12T00:00:00"),
    ("John", 25, "Chicago", "1", "2023-05-13T00:00:00"),
    ("Jane", 30, "San Francisco", "2", "2023-05-13T00:00:00"),
    ("Bob", 22, "Los Angeles", "3", "2023-05-14T00:00:00")
  ).toDF("name", "age", "city", "GlobalKey", "export_end_date")

  test("latest export_end_date wins per key (no InsertedDate)") {
    val out = DedupLatest.latestExport(sample, Seq("GlobalKey"))
    val rows = out.select("GlobalKey", "city").as[(String, String)].collect().toMap
    assert(rows === Map("1" -> "Chicago", "2" -> "San Francisco", "3" -> "Los Angeles"))
  }

  test("InsertedDate takes precedence; export_end_date breaks ties") {
    val df = Seq(
      // key 1: later InsertedDate wins despite earlier export_end_date
      ("1", "2023-05-10T00:00:00", "2023-05-14T00:00:00", "a"),
      ("1", "2023-05-11T00:00:00", "2023-05-12T00:00:00", "b"),
      // key 2: InsertedDate ties -> later export_end_date wins
      ("2", "2023-05-11T00:00:00", "2023-05-12T00:00:00", "c"),
      ("2", "2023-05-11T00:00:00", "2023-05-13T00:00:00", "d")
    ).toDF("GlobalKey", "InsertedDate", "export_end_date", "tag")
    val out = DedupLatest.latestExport(df, Seq("GlobalKey"))
    val rows = out.select("GlobalKey", "tag").as[(String, String)].collect().toMap
    assert(rows === Map("1" -> "b", "2" -> "d"))
  }

  test("dedup is idempotent and output keys are unique") {
    val once = DedupLatest.latestExport(sample, Seq("GlobalKey"))
    val twice = DedupLatest.latestExport(once, Seq("GlobalKey"))
    assert(once.count() === twice.count())
    assert(once.select("GlobalKey").distinct().count() === once.count())
  }
}
