package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrchestratorSpec extends SparkSpec {
  import Orchestrator._
  import spark.implicits._

  private val dag = Seq(
    StageSpec("crawler", Seq("crawler")),
    StageSpec("non-device", Seq("enrolled", "symptoms")),
    StageSpec("healthkit", Seq("hk_heartbeat", "hk_workout")),
    StageSpec("compare", Seq("compare")))

  test("all stages run in order when every type succeeds") {
    val ran = Seq.newBuilder[String]
    val report = Orchestrator.run(dag) { t => ran += t; () }
    assert(report.ok)
    assert(ran.result() == Seq("crawler", "enrolled", "symptoms",
      "hk_heartbeat", "hk_workout", "compare"))
    assert(report.stages.forall(!_.skipped))
  }

  test("a failing type still lets siblings run but gates later stages") {
    val ran = Seq.newBuilder[String]
    val report = Orchestrator.run(dag) { t =>
      ran += t
      if (t == "enrolled") sys.error("schema drift")
    }
    assert(!report.ok)
    // sibling 'symptoms' ran despite 'enrolled' failing
    assert(ran.result() == Seq("crawler", "enrolled", "symptoms"))
    assert(report.failures == Seq(("enrolled", "schema drift")))
    assert(report.stages.drop(2).forall(_.skipped), "healthkit+compare skipped")
  }

  test("ingest event filter drops markers, directories, blanks, test events") {
    val events = Seq(
      ("b", "export/2024/file.zip", null.asInstanceOf[String]),
      ("b", "export/owner.txt", null.asInstanceOf[String]),
      ("b", "export/2024/", null.asInstanceOf[String]),
      ("", "export/2024/file2.zip", null.asInstanceOf[String]),
      ("b", null.asInstanceOf[String], null.asInstanceOf[String]),
      ("b", "export/2024/file3.zip", "s3:TestEvent"),
      ("b", "export/2024/file4.zip", "ObjectCreated:Put")
    ).toDF("bucket", "key", "event")
    val kept = filterIngestEvents(events, eventCol = Some("event"))
      .select("key").as[String].collect().toSet
    assert(kept == Set("export/2024/file.zip", "export/2024/file4.zip"))
  }

  test("reconcile returns exactly the missing keys and converges to empty") {
    val expected = (1 to 10).map(i => s"k$i").toDF("key")
    val present = Seq("k1", "k3", "k5", "k7", "k9").toDF("key")
    val missing = reconcile(expected, present, Seq("key"))
    assert(missing.as[String].collect().toSet ==
      Set("k2", "k4", "k6", "k8", "k10"))
    // after dispatching the missing ones, reconciliation is empty — idempotent
    val after = present.union(missing.select("key"))
    assert(reconcile(expected, after, Seq("key")).isEmpty)
  }
}
