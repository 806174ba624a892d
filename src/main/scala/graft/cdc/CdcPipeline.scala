package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** One incremental merge run — the whole of the reference procedure
  * `PS_SP_ETL_MERGE_JOB` (bigquery_syntex_merge_sql/merge.sql) /
  * `sp_cdc_merge_job` (mysql step-8), config-driven:
  *
  *   config → previous watermark → window scan → compaction →
  *   typed projection → snapshot merge → versioned swap → job log.
  *
  * Differences from the reference, deliberate (SURVEY.md §3/§5):
  *  - no dynamic SQL: the projection is Column builders from config;
  *  - one compaction pass routes upserts/deletes (the reference
  *    scans the source twice and left-joins the two views);
  *  - "transaction" = versioned snapshot directory + pointer file
  *    (parquet has no MERGE; a failed run never touches the live
  *    version, which is the reference's ROLLBACK — merge.sql:441–457);
  *  - the job-log row is written for both SUCCESS and FAILED runs.
  */
object CdcPipeline {

  final case class RunResult(
      status: String, inserted: Long, deleted: Long,
      windowStartUs: Long, windowEndUs: Long, version: Long)

  private val VersionFile = "_VERSION"

  /** Pointer contents: `<version>[ <batchId>]` — one line, swapped
    * atomically, so the committed version and the streaming batch
    * that produced it are one unit (no separate marker to tear).
    */
  private def pointer(targetDir: String): Option[(Long, Long)] = {
    val p = Paths.get(targetDir, VersionFile)
    if (Files.exists(p)) {
      val toks = Files.readString(p).trim.split("\\s+")
      Some((toks(0).toLong, if (toks.length > 1) toks(1).toLong else -1L))
    } else None
  }

  def currentVersion(targetDir: String): Option[Long] = pointer(targetDir).map(_._1)

  /** Highest streaming batchId committed into this target (-1 when the
    * target was only ever written by batch runs).
    */
  def lastCommittedBatch(targetDir: String): Option[Long] = pointer(targetDir).map(_._2)

  def readSnapshot(spark: SparkSession, targetDir: String): Option[DataFrame] =
    currentVersion(targetDir).map(v => spark.read.parquet(s"$targetDir/v$v"))

  /** Publish `df` as the next snapshot version and move the pointer.
    * The pointer write is a same-directory atomic move, so a reader
    * sees either the old or the new version, never a torn state (the
    * object-store deployment would swap a manifest the same way).
    * `batchId` records the streaming micro-batch that produced this
    * version (exactly-once replay guard; -1 for batch runs).
    */
  private[graft] def publish(df: DataFrame, targetDir: String, pkCols: Seq[String],
      batchId: Long = -1L): Long = {
    val next = currentVersion(targetDir).getOrElse(-1L) + 1
    // Hash-layout by PK so the next merge's anti-join and any
    // point-lookup reads co-locate (SURVEY.md §5).
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        pkCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$targetDir/v$next")
    val tmp = Paths.get(targetDir, s".$VersionFile.tmp")
    Files.writeString(tmp, s"$next $batchId")
    Files.move(tmp, Paths.get(targetDir, VersionFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Run one incremental merge for `cfg`, reading envelope rows from
    * `source` (already in CdcEnvelope shape), windowed to
    * (last watermark, nowUs].
    */
  def run(spark: SparkSession, cfg: CdcTableConfig, source: DataFrame,
      logDir: String, nowUs: Long): RunResult = {
    if (!cfg.isActive) // is_active gate, merge.sql:92–94
      return RunResult("SKIPPED", 0, 0, 0, 0, currentVersion(cfg.targetPath).getOrElse(-1))
    val startUs = JobLog.lastWatermark(spark, logDir, cfg)
    var changes: DataFrame = null
    try {
      val win = CdcEnvelope.window(source, startUs, nowUs, cfg.partitionField)
      val projected = TypedProjection.project(win, CdcEnvelope.DataCol, cfg.fieldSpecs,
        keep = cfg.pk ++ Seq(CdcEnvelope.OpCol, CdcEnvelope.TsCol, CdcEnvelope.PosCol,
          CdcEnvelope.LoadTsCol) ++ cfg.passthrough)
      changes = ChangeCompaction.compactForMerge(projected, cfg.pk).cache()
      val nIns = changes.filter(col(CdcEnvelope.OpCol) =!= CdcEnvelope.Delete).count()
      val nDel = changes.filter(col(CdcEnvelope.OpCol) === CdcEnvelope.Delete).count()
      val bounds = win.agg(min(col(CdcEnvelope.LoadTsCol)), max(col(CdcEnvelope.LoadTsCol))).collect()(0)
      val (cdcStart, cdcEnd) =
        if (bounds.isNullAt(0)) (nowUs, nowUs) else (bounds.getLong(0), bounds.getLong(1))
      val merged = readSnapshot(spark, cfg.targetPath) match {
        case Some(target) => SnapshotMerge.merge(target, changes, cfg.pk, Some(nIns + nDel))
        case None => SnapshotMerge.fromHistory(changes, cfg.pk, cfg.targetCols)
      }
      val version = publish(merged.select(cfg.targetCols.map(col): _*), cfg.targetPath, cfg.pk)
      // Watermark advances to the *window end*, not max(load_ts) —
      // an empty window must still move time forward.
      JobLog.append(spark, logDir, JobLog.RunRecord(
        java.util.UUID.randomUUID().toString, cfg.cdcTable, cfg.targetDb, cfg.targetTable,
        cdcStart, nowUs, nowUs, "SUCCESS", "", nIns, nDel))
      RunResult("SUCCESS", nIns, nDel, startUs, nowUs, version)
    } catch {
      case e: Throwable =>
        JobLog.append(spark, logDir, JobLog.RunRecord(
          java.util.UUID.randomUUID().toString, cfg.cdcTable, cfg.targetDb, cfg.targetTable,
          startUs, nowUs, nowUs, "FAILED", String.valueOf(e.getMessage), 0, 0))
        throw e
    } finally if (changes != null) changes.unpersist()
  }

  /** Run every active config against its source — the platform loop
    * the reference drives via a scheduler calling the procedure per
    * (db, table, cdc_table). `sources` resolves a config's
    * `sourcePath` to its envelope DataFrame. Failures are isolated
    * per table (logged FAILED by `run`, surfaced in the result).
    */
  def runAll(spark: SparkSession, configs: Seq[CdcTableConfig],
      sources: CdcTableConfig => DataFrame, logDir: String,
      nowUs: Long): Map[String, Either[Throwable, RunResult]] =
    configs.map { cfg =>
      val key = s"${cfg.targetDb}.${cfg.targetTable}"
      key -> (try Right(run(spark, cfg, sources(cfg), logDir, nowUs))
      catch { case e: Throwable => Left(e) })
    }.toMap
}
