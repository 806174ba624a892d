package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GDPR erasure queue (A58) — the right-to-be-forgotten pipeline
  * composed from the store's own primitives: erasure REQUESTS land in
  * a (small) graft store of their own, a durable cursor (A34's
  * process-then-commit discipline) delivers each batch of new
  * requests exactly once, and every batch applies to the target as a
  * MERGE-ON-READ delete (A53) — the one-user-spread-over-every-bucket
  * shape deletion vectors exist for. Write cost per batch ∝ matched
  * rows; `autoFoldPct` (A56) bounds the accumulated vector.
  *
  * Exactly-once EFFECT, not delivery: the cursor commits only after
  * the delete publishes, so a crash between them re-delivers the
  * batch — and re-deleting already-deleted subjects matches nothing
  * and publishes nothing (deleteWhereMoR's no-match short-circuit),
  * making the retry a no-op. That idempotence is what lets the
  * coordination stay a one-line cursor file instead of a 2PC.
  *
  * Batch contract: the subject keys stay a DataFrame end to end —
  * the delete is [[CdcPipeline.deleteKeysMoR]]'s broadcast semi
  * join, so a 10k-subject batch costs one hashed build, not a
  * 10k-literal codegen'd predicate. GDPR queues are human-scale —
  * thousands, not billions; a bulk purge beyond broadcast scale
  * belongs on [[CdcPipeline.deleteWhere]] with a predicate, or
  * `deleteKeysMoR(broadcastKeys = false)`.
  */
object Erasure {

  /** Apply every not-yet-applied erasure request to the target.
    *
    * @param queueDir   graft store holding requests; its snapshot
    *                   diff (op = 'i' rows since the cursor) is the
    *                   pending batch
    * @param subjectCol column IN THE QUEUE holding the subject key
    * @param targetDir  store to erase from
    * @param targetPk   the target's PK columns (bucket routing)
    * @param targetCol  column IN THE TARGET matching the subject key
    * @return (requests applied, rows erased), None when nothing new.
    *         First call baselines the cursor (consumeSnapshotDiff
    *         contract): pre-existing requests are treated as already
    *         applied — enqueue AFTER wiring the consumer, or replay
    *         old requests explicitly.
    */
  def apply(spark: SparkSession, queueDir: String, queuePk: Seq[String],
      subjectCol: String, targetDir: String, targetPk: Seq[String],
      targetCol: String, consumer: String = "erasure",
      autoFoldPct: Option[Int] = None): Option[(Long, Long)] = {
    var out: Option[(Long, Long)] = None
    ChangeFeeds.consumeSnapshotDiff(spark,
      CdcTableConfig(cdcTable = "erasure_queue", sourcePath = queueDir,
        targetDb = "", targetTable = "", targetPath = queueDir,
        pk = queuePk, fieldSpecs = Nil),
      consumer) { diff =>
      // The subjects stay a DataFrame end to end (r9 verdict #5): a
      // 10k-subject batch as an isin literal list would compile 10k
      // operands into one codegen'd predicate — deleteKeysMoR's
      // broadcast semi join is one hashed build at any batch size.
      // localCheckpoint pins the batch so the count and the delete
      // see the same rows.
      val subjects = diff.filter(col(CdcEnvelope.OpCol) === "i")
        .select(subjectCol).distinct().localCheckpoint()
      val nSubjects = subjects.count()
      if (nSubjects > 0L) {
        val (_, erased) = CdcPipeline.deleteKeysMoR(spark, targetDir, targetPk,
          targetCol, subjects, autoFoldPct)
          .getOrElse(throw new IllegalStateException(s"no store at $targetDir"))
        out = Some((nSubjects, erased))
      } else out = Some((0L, 0L))
    }
    out
  }
}
