package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Run log + incremental watermark persistence — the Spark form of
  * the reference's `etl_job_log_incremental_date` table
  * (reference: merge_procedures_mysql/etl_job_log_incremental_date_mysql.sql,
  * bigquery_syntex_merge_sql/incremental-date.sql; written at
  * merge.sql:520–581). A tiny append-only parquet log; the next run's
  * window start = MAX(cdc_end_us) for the (cdc_table, target) pair
  * (merge.sql:111–115), epoch when absent.
  *
  * records_inserted / records_updated are the reference's MERGE
  * outcome split (merge.sql:520–534): an upsert counts as *updated*
  * iff its PK already existed in the pre-merge target, *inserted*
  * otherwise.
  */
object JobLog {

  final case class RunRecord(
      run_id: String,
      cdc_table: String,
      target_db: String,
      target_table: String,
      cdc_start_us: Long,
      cdc_end_us: Long,
      insert_ts_us: Long,
      run_status: String,
      error_msg: String,
      records_inserted: Long,
      records_updated: Long,
      records_deleted: Long)

  def read(spark: SparkSession, logDir: String): Option[DataFrame] = {
    // an existing-but-empty dir (fresh deployment) has no schema
    val hasData = parquetFiles(logDir).nonEmpty
    // mergeSchema: a log dir that predates the r3 insert/update split
    // has files without records_inserted/records_updated; the default
    // sampled-footer schema read could miss (or inconsistently
    // surface) the new columns on such mixed directories. The log is
    // tiny (one row per run), so merging every footer is free.
    if (hasData) Some(spark.read.option("mergeSchema", "true").parquet(logDir)) else None
  }

  /** Previous watermark for this (cdc_table, target), epoch if none —
    * exactly COALESCE(MAX(CDC_END_TS), '1970-01-01') of the
    * reference (merge.sql:114).
    */
  def lastWatermark(spark: SparkSession, logDir: String, cfg: CdcTableConfig): Long =
    read(spark, logDir).map { df =>
      val r = df.filter(col("cdc_table") === cfg.cdcTable &&
          col("target_db") === cfg.targetDb &&
          col("target_table") === cfg.targetTable &&
          col("run_status") === "SUCCESS")
        .agg(max(col("cdc_end_us"))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }.getOrElse(0L)

  /** Appends one run row — and keeps the directory bounded: every
    * append leaves one more small file, so a target merged every
    * minute for a year is ~500k files of one row each, and the
    * footer-merging `read` (hence every watermark lookup) degrades
    * with the file count, not the row count. Once the directory holds
    * `autoCompactAt` files the append triggers [[compact]], so steady
    * state is O(autoCompactAt) files regardless of run count. Pass
    * `autoCompactAt = 0` to disable (callers that schedule `compact`
    * themselves).
    */
  def append(spark: SparkSession, logDir: String, rec: RunRecord,
      autoCompactAt: Int = 64): Unit = {
    import spark.implicits._
    Seq(rec).toDF().coalesce(1).write.mode(SaveMode.Append).parquet(logDir)
    if (autoCompactAt > 0) { compact(spark, logDir, minFiles = autoCompactAt); () }
  }

  // fully-qualified paths via the Hadoop FileSystem API, so the log
  // works on any scheme (a java.io listing on hdfs://s3a:// returns
  // null and auto-compaction would silently stop — ADVICE r5)
  private def parquetFiles(logDir: String): Seq[String] =
    StoreFs.listFilePaths(logDir, ".parquet")

  /** Rewrite the log's current files into ONE (when at least
    * `minFiles` have accumulated), under the pipeline's single-writer
    * contract. Crash-safe by ordering: the combined file is written
    * BEFORE the inputs are deleted, so a crash in between leaves
    * duplicate rows, never lost ones — and duplicates are harmless to
    * every consumer (`lastWatermark` is a MAX) and are healed by the
    * next compact's `run_id` dedup. Concurrent READERS of the
    * directory (other sessions) may transiently see those duplicates;
    * the writer itself never races because it is the one calling this.
    * Returns the number of input files removed (0 = below threshold).
    */
  def compact(spark: SparkSession, logDir: String, minFiles: Int = 16): Int = {
    val files = parquetFiles(logDir)
    if (files.size < minFiles) 0
    else {
      // pin the read to this exact file snapshot: the combined file we
      // append below must not feed its own input
      val all = spark.read.option("mergeSchema", "true")
        .parquet(files: _*)
        .dropDuplicates("run_id")
      all.coalesce(1).write.mode(SaveMode.Append).parquet(logDir)
      // FileSystem.delete on a checksum FS removes the .crc sibling
      // with the file — no hand-rolled cleanup
      files.foreach(StoreFs.deleteFile)
      files.size
    }
  }
}
