package graft.operators

import graft.SparkSpec

/** Ports `test_drop_deleted_healthkit_data_{nonempty,empty,nonexistent_table}`
  * (reference `tests/test_json_to_parquet.py:1031-1112`).
  */
class DropDeletedSpec extends SparkSpec {
  import spark.implicits._

  private def table = Seq(
    ("p1", "k1", "2023-05-12T00:00:00"),
    ("p1", "k2", "2023-05-12T00:00:00"),
    ("p2", "k3", "2023-05-12T00:00:00")
  ).toDF("ParticipantIdentifier", "HealthKitSampleKey", "export_end_date")

  test("rows with tombstoned keys are removed") {
    val deleted = Seq(("p1", "k2", "2023-05-14T00:00:00"))
      .toDF("ParticipantIdentifier", "HealthKitSampleKey", "export_end_date")
    val out = DropDeleted(table, Some(deleted),
      Seq("ParticipantIdentifier", "HealthKitSampleKey"))
    assert(out.select("HealthKitSampleKey").as[String].collect().toSet === Set("k1", "k3"))
  }

  test("empty tombstone table is a no-op") {
    val deleted = table.limit(0)
    val out = DropDeleted(table, Some(deleted),
      Seq("ParticipantIdentifier", "HealthKitSampleKey"))
    assert(out.count() === 3)
  }

  test("missing tombstone table raises") {
    assertThrows[IllegalArgumentException] {
      DropDeleted(table, None, Seq("ParticipantIdentifier", "HealthKitSampleKey"))
    }
  }

  test("bloom-pruned variant matches the plain anti join") {
    val deleted = Seq(("p1", "k2", "2023-05-14T00:00:00"))
      .toDF("ParticipantIdentifier", "HealthKitSampleKey", "export_end_date")
    val keys = Seq("ParticipantIdentifier", "HealthKitSampleKey")
    val out = DropDeleted.pruned(table, Some(deleted), keys)
    assert(out.select("HealthKitSampleKey").as[String].collect().toSet === Set("k1", "k3"))
    assert(DropDeleted.pruned(table, Some(table.limit(0)), keys).count() === 3)
  }
}
