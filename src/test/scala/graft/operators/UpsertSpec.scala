package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def existing = Seq(
    ("k1", "old1", "2023-05-01"), ("k2", "old2", "2023-05-01"),
    ("k3", "old3", "2023-05-01")).toDF("GlobalKey", "v", "export_end_date")

  test("updates win, untouched keys kept, tombstones subtract") {
    val updates = Seq(("k2", "new2", "2023-05-08"), ("k4", "new4", "2023-05-08"))
      .toDF("GlobalKey", "v", "export_end_date")
    val deletes = Seq(Tuple1("k3")).toDF("GlobalKey")
    val out = Upsert(existing, updates, Seq("GlobalKey"), Some(deletes))
      .select("GlobalKey", "v").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "old1", "k2" -> "new2", "k4" -> "new4"))
  }

  test("latestWins dedups the incoming batch before merging") {
    val updates = Seq(
      ("k1", "mid", "2023-05-05"), ("k1", "newest", "2023-05-09"))
      .toDF("GlobalKey", "v", "export_end_date")
    val out = Upsert.latestWins(existing, updates, Seq("GlobalKey"), "export_end_date")
      .select("GlobalKey", "v").as[(String, String)].collect().toMap
    assert(out("k1") === "newest" && out("k2") === "old2")
  }

  test("idempotent: re-applying the same batch changes nothing") {
    val updates = Seq(("k2", "new2", "2023-05-08")).toDF("GlobalKey", "v", "export_end_date")
    val once = Upsert(existing, updates, Seq("GlobalKey"))
    val twice = Upsert(once, updates, Seq("GlobalKey"))
    assert(once.collect().toSet === twice.collect().toSet)
  }
}
