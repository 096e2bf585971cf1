package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.{Failure, Success, Try}

/** The reference's workflow semantics (SURVEY §2.7), restated as a driver
  * program instead of managed-workflow config:
  *
  *  - staged DAG with ALL-SUCCEEDED gating — each stage's data types run
  *    only if every type of the previous stage succeeded (reference
  *    `templates/glue-workflow.j2:168-260`), single concurrent run by
  *    construction (one driver);
  *  - ingest event filtering (`s3_to_glue/app.py:18-94`): drop records
  *    with a missing bucket/key, `owner.txt` markers, directory keys, and
  *    provider test events;
  *  - idempotent mirror reconciliation (`raw_sync/app.py:486-511`):
  *    expected-key set difference → the list to re-dispatch. Re-running
  *    reconcile after a partial dispatch converges to empty — that IS the
  *    idempotency.
  *
  * Types within a stage are independent (the reference's ordering exists
  * for shared-cluster capacity, not correctness), so intra-stage failures
  * don't stop siblings — they only gate the NEXT stage.
  */
object Orchestrator {

  final case class StageSpec(name: String, types: Seq[String])
  final case class TypeResult(dataType: String, error: Option[String]) {
    def ok: Boolean = error.isEmpty
  }
  /** `skipped` stages never ran because an earlier stage failed. */
  final case class StageResult(name: String, results: Seq[TypeResult],
                               skipped: Boolean) {
    def ok: Boolean = !skipped && results.forall(_.ok)
  }
  final case class RunReport(stages: Seq[StageResult]) {
    def ok: Boolean = stages.forall(_.ok)
    def failures: Seq[(String, String)] = for {
      s <- stages; r <- s.results; e <- r.error
    } yield (r.dataType, e)
  }

  /** Run `job` for every type, stage by stage, with ALL-SUCCEEDED gating.
    * Every type of a runnable stage is attempted even if a sibling fails
    * (independent types); later stages are marked skipped.
    */
  def run(stages: Seq[StageSpec])(job: String => Unit): RunReport = {
    val out = Seq.newBuilder[StageResult]
    var gate = true
    for (stage <- stages) {
      if (!gate) out += StageResult(stage.name, Seq.empty, skipped = true)
      else {
        val results = stage.types.map { t =>
          Try(job(t)) match {
            case Success(_) => TypeResult(t, None)
            case Failure(e) =>
              TypeResult(t, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
          }
        }
        val sr = StageResult(stage.name, results, skipped = false)
        out += sr
        gate = sr.ok
      }
    }
    RunReport(out.result())
  }

  /** Keep only ingest-worthy object records: non-empty bucket and key, not
    * an `owner.txt` marker, not a directory key, and not a provider test
    * event (`eventCol` == "s3:TestEvent" when present). Narrow filter — at
    * any event volume this is a scan, never a shuffle.
    */
  def filterIngestEvents(events: DataFrame, bucketCol: String = "bucket",
                         keyCol: String = "key",
                         eventCol: Option[String] = None): DataFrame = {
    val base = events
      .where(col(bucketCol).isNotNull && col(bucketCol) =!= "")
      .where(col(keyCol).isNotNull && col(keyCol) =!= "")
      .where(!col(keyCol).contains("owner.txt"))
      .where(!col(keyCol).endsWith("/"))
    eventCol.fold(base)(ec =>
      base.where(col(ec).isNull || col(ec) =!= "s3:TestEvent"))
  }

  /** Mirror reconciliation: the expected keys that are NOT present — the
    * re-dispatch list. A plain left-anti on the key columns; at 100 TB both
    * sides are file LISTINGS (one row per object, not object bytes), so
    * this is a small compact-key shuffle. Running it again after a partial
    * re-dispatch yields only what is still missing.
    */
  def reconcile(expected: DataFrame, present: DataFrame,
                keyCols: Seq[String]): DataFrame =
    // no distinct on the anti side: left_anti is duplicate-insensitive on
    // the right, and the hash-aggregate would add a second full shuffle
    // of the present-side keys for identical output
    expected.join(present.select(keyCols.map(col): _*), keyCols, "left_anti")
}
