package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Checkpoint-to-store binding for streaming index ingest.
  *
  * The batch appends ([[graft.operators.Ivf.append]] and friends) are
  * retry-idempotent via dynamic partition overwrite under an inner
  * `batch_id` partition — which means a WRONG batch id does not fail, it
  * silently REPLACES someone else's rows. A streaming job that maps its
  * engine `batchId` blindly onto append ids is therefore exposed to three
  * silent-data-loss scenarios: a deleted-and-recreated checkpoint restarts
  * engine ids at 0; a second stream on the same store issues the same ids;
  * and an interleaved manual `append` can land inside the stream's id
  * range and be overwritten by the next micro-batch.
  *
  * This object closes all three with two tiny marker files:
  *
  *   - `<checkpointDir>/graft_stream_token` — a UUID identifying THIS
  *     checkpoint lineage, created on first use. Deleting the checkpoint
  *     deletes the token; a recreated checkpoint gets a fresh UUID.
  *   - `<indexPath>/_stream_binding` — `token`, `base` (max batch id that
  *     existed in the store at bind time), `max_claimed` (high-water mark
  *     of append ids this stream has CLAIMED — advanced BEFORE the append
  *     lands, so a crash mid-append replays as our own batch) and
  *     `max_written` (high-water mark of appends CONFIRMED landed via
  *     [[recordWritten]]).
  *
  * Residual risk of the claim-before-append design: an id that was claimed
  * but whose append never landed (the caller resolved, then aborted or the
  * batch permanently failed) is in the gap `max_written < id <=
  * max_claimed`. If a manual/foreign append later lands at such an id, the
  * stream's eventual replay of that batch is INDISTINGUISHABLE from
  * replaying its own half-committed write — the claimed/written split
  * narrows the window to exactly these ids and [[resolveAppendId]] logs a
  * loud warning before overwriting one that already has data, but it
  * cannot prove whose rows they are. Operators appending manually to a
  * stream-bound store must stay outside `[base+1, max_claimed]`.
  *
  * Resolution: streaming batch `b` maps to append id `base + 1 + b`. The
  * binding is created on the stream's first micro-batch and REFUSED with
  * an explicit error if the store is already bound to a different token
  * (second stream / recreated checkpoint) — the operator must either point
  * the new stream at a fresh store or consciously delete the binding after
  * verifying no id ranges collide. A new (non-replay) batch additionally
  * verifies its target id is not already present in the store, so a manual
  * append that raced into the stream's range fails loudly instead of being
  * overwritten.
  *
  * Single-writer contract (same as [[graft.pipeline.IndexVersions]]): one
  * stream owns a store's binding; the markers detect violations, they do
  * not arbitrate concurrent writers racing within one micro-batch.
  */
object StreamBinding {

  final case class Binding(token: String, base: Long, maxClaimed: Long,
                           maxWritten: Long)

  private val BindingFile = "_stream_binding"
  private val TokenFile = "graft_stream_token"

  /** Distinct `batch_id` values present in a store's partitioned dataset
    * dir, at ANY partition depth: `batch_id=N` directly ([[DedupStream]]),
    * under one outer partition (the retrieval indexes' `cell=K` /
    * `bucket=K` layouts), or under several (a payload-partitioned
    * [[graft.operators.Ivf]] store nests batch_id under payload dirs and
    * cell dirs — a fixed-depth glob here would report an EMPTY id set for
    * such a store and let the very overwrite this binding exists to
    * prevent through). The walk visits partition directories only
    * (skipping underscore/dot-prefixed metadata and stopping at each
    * `batch_id=N`), never data files. Missing dir ⇒ empty (a store that
    * has never been written).
    */
  def existingBatchIds(spark: SparkSession, dataDir: String): Set[Long] = {
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Set.empty
    val out = scala.collection.mutable.Set[Long]()
    def walk(dir: Path): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && !name.startsWith("_") && !name.startsWith(".")) {
          if (name.startsWith("batch_id="))
            scala.util.Try(name.stripPrefix("batch_id=").toLong)
              .foreach(out += _)
          else walk(st.getPath)
        }
      }
    walk(p)
    out.toSet
  }

  /** Resolve the append id for streaming micro-batch `streamBatchId`,
    * creating or validating the checkpoint-to-store binding. Throws (never
    * overwrites) on a token mismatch or an id collision with rows this
    * stream did not write. Call [[recordWritten]] after the append lands.
    */
  def resolveAppendId(spark: SparkSession, checkpointDir: String,
                      indexPath: String, dataDir: String,
                      streamBatchId: Long): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(indexPath).getFileSystem(conf)
    // the token lives in the CHECKPOINT directory, which may be on a
    // different filesystem than the index store (e.g. local checkpoint,
    // object-store index) — resolve its fs from the checkpoint path, not
    // the index path, or a recreated checkpoint on another fs would silently
    // reuse a stale token and defeat the lineage check
    val tokenFs = new Path(checkpointDir, TokenFile).getFileSystem(conf)
    val token = readOrCreateToken(tokenFs, checkpointDir)
    val bindingPath = new Path(indexPath, BindingFile)
    val binding = readBinding(fs, bindingPath) match {
      case Some(b) if b.token == token => b
      case Some(b) =>
        throw new IllegalStateException(
          s"index store $indexPath is bound to streaming checkpoint token " +
          s"${b.token}, but this stream (checkpoint $checkpointDir) has token " +
          s"$token — a second stream or a deleted-and-recreated checkpoint " +
          "would silently overwrite previously appended batches. Point this " +
          "stream at a fresh store, or delete the store's " +
          s"$BindingFile after verifying no batch-id ranges collide.")
      case None =>
        val base = (existingBatchIds(spark, dataDir) + 0L).max
        val b = Binding(token, base, base, base)
        writeBinding(fs, bindingPath, b)
        b
    }
    val target = binding.base + 1 + streamBatchId
    // a replay of a batch this stream already CLAIMED (target <= maxClaimed)
    // legitimately hits an existing partition; anything else colliding means
    // a foreign writer
    if (target > binding.maxClaimed) {
      if (existingBatchIds(spark, dataDir).contains(target)) {
        throw new IllegalStateException(
          s"streaming batch $streamBatchId maps to append batch_id=$target in " +
          s"$indexPath, but that batch already exists and was not written by " +
          "this stream (manual append or foreign writer inside the stream's " +
          "id range) — refusing to overwrite it.")
      }
      // claim the id BEFORE the append lands: if the process dies between
      // the append and any post-append bookkeeping, the engine replays the
      // same batch, and the claim is what lets us recognize the
      // half-committed partition as our own (and idempotently re-overwrite
      // it) instead of misdiagnosing it as a foreign writer and wedging the
      // stream permanently. maxWritten only advances in [[recordWritten]],
      // so claimed-but-unconfirmed ids stay identifiable.
      writeBinding(fs, bindingPath, binding.copy(maxClaimed = target))
    } else if (target > binding.maxWritten &&
               existingBatchIds(spark, dataDir).contains(target)) {
      // the one ambiguous case (see object doc): data exists at an id we
      // claimed but never confirmed written. Almost certainly our own
      // half-committed append being replayed — but a foreign writer that
      // raced into the claimed slot would be overwritten too, so say so.
      System.err.println(
        s"[stream-binding] WARNING: replaying streaming batch $streamBatchId " +
        s"onto append batch_id=$target in $indexPath, which was claimed but " +
        "never confirmed written — overwriting it as a presumed self-replay. " +
        "If a manual append landed at this id, its rows are being replaced.")
    }
    target
  }

  /** Confirm an append landed: advances `max_written` up to `appendId`
    * (and `max_claimed`, for callers that resolved an id out of band).
    * Closing the claimed→written gap is what keeps the ambiguous-replay
    * window (see object doc) to only the batches that genuinely crashed
    * mid-append.
    */
  def recordWritten(spark: SparkSession, indexPath: String, appendId: Long): Unit = {
    val fs = new Path(indexPath).getFileSystem(spark.sessionState.newHadoopConf())
    val bindingPath = new Path(indexPath, BindingFile)
    val b = readBinding(fs, bindingPath).getOrElse(
      throw new IllegalStateException(
        s"no $BindingFile under $indexPath — resolveAppendId must run first"))
    if (appendId > b.maxWritten)
      writeBinding(fs, bindingPath, b.copy(
        maxClaimed = math.max(b.maxClaimed, appendId), maxWritten = appendId))
  }

  private def readOrCreateToken(fs: FileSystem, checkpointDir: String): String = {
    val p = new Path(checkpointDir, TokenFile)
    if (fs.exists(p)) readSmall(fs, p).trim
    else {
      val t = java.util.UUID.randomUUID().toString
      writeSmall(fs, p, t)
      t
    }
  }

  private def readBinding(fs: FileSystem, p: Path): Option[Binding] =
    if (!fs.exists(p)) None
    else {
      val kv = readSmall(fs, p).linesIterator.flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap
      // an unparseable binding is a hard error, NOT a rebind: silently
      // rebinding after corruption re-derives a higher base and a replayed
      // batch would then duplicate instead of replace
      // max_claimed is new in the claimed/written split: a binding written
      // by an older build lacks it — treat claimed = written (that build
      // advanced max_written at claim time, so written WAS the claim mark)
      (for {
        t <- kv.get("token"); b <- kv.get("base").map(_.toLong)
        m <- kv.get("max_written").map(_.toLong)
      } yield Binding(t, b,
        kv.get("max_claimed").map(_.toLong).getOrElse(m), m))
        .orElse(throw new IllegalStateException(
        s"corrupt stream binding at $p (${readSmall(fs, p).take(200)}); " +
        "repair or remove it after verifying batch-id ranges manually"))
    }

  private def writeBinding(fs: FileSystem, p: Path, b: Binding): Unit =
    writeSmall(fs, p,
      s"token=${b.token}\nbase=${b.base}\nmax_claimed=${b.maxClaimed}\n" +
      s"max_written=${b.maxWritten}\n")

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomic publish: write to a temp file, then rename-with-overwrite onto
    * the target. A plain `fs.create(p, true)` truncates in place, so a crash
    * mid-write leaves a torn (empty or partial) binding that
    * [[readBinding]] would reject as corrupt — wedging the stream.
    * `FileContext.rename(OVERWRITE)` is atomic on HDFS and a posix rename on
    * the local fs.
    */
  private def writeSmall(fs: FileSystem, p: Path, s: String): Unit = {
    val qp = fs.makeQualified(p)
    val tmp = new Path(qp.getParent, s".${qp.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(qp.toUri, fs.getConf)
    fc.rename(fs.makeQualified(tmp), qp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
