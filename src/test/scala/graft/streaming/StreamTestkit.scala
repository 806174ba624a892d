package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.cdc.{CdcTableConfig, SnapshotMerge}

/** TEST-SCOPE streaming double (moved out of src/main, r9 verdict
  * #6): an in-memory "target" that collects the full merged snapshot
  * to the driver every micro-batch. That design is exactly what the
  * production path must never do — it exists so specs can assert
  * stream-end convergence without filesystem churn, and it lives in
  * test scope so no production caller can reach it. The production
  * merge is `CdcStream.startMergeToTarget` (versioned bucketed store,
  * delta-priced publishes).
  */
object StreamTestkit {

  /** Streaming merge into the in-memory [[SnapshotStore]]. */
  def startMerge(env: DataFrame, cfg: CdcTableConfig, checkpoint: String)(
      onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    env.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val changes = CdcStream.compactBatch(batch.toDF(), cfg)
        SnapshotStore.merge(cfg, changes, batchId)
        onBatch(SnapshotStore.get(cfg.targetPath).orNull, batchId)
        ()
      }
      .start()
  }
}

/** Driver-local snapshot state for streaming tests — maps a target
  * path to its current merged snapshot (collected rows + schema kept
  * as a DataFrame). Stands in for the parquet/Delta target so specs
  * can assert convergence without filesystem races. Tracks the last
  * applied batchId per target so a replayed micro-batch is skipped —
  * the same guard the production versioned-parquet path gets from
  * the version pointer.
  */
object SnapshotStore {
  private val store = scala.collection.concurrent.TrieMap.empty[String, (DataFrame, Long)]

  def get(path: String): Option[DataFrame] = store.get(path).map(_._1)
  def lastBatch(path: String): Option[Long] = store.get(path).map(_._2)

  def merge(cfg: CdcTableConfig, changes: DataFrame, batchId: Long = -1L): Unit = synchronized {
    if (store.get(cfg.targetPath).exists(_._2 >= batchId) && batchId >= 0) return
    val next = store.get(cfg.targetPath) match {
      case Some((target, _)) => SnapshotMerge.merge(target, changes, cfg.pk)
      case None => SnapshotMerge.fromHistory(changes, cfg.pk, cfg.targetCols)
    }
    // Materialize: foreachBatch DataFrames are only valid within the
    // batch, so pin the rows.
    val spark = changes.sparkSession
    val rows = next.select(cfg.targetCols.map(col): _*).collect().toSeq
    val schema = next.select(cfg.targetCols.map(col): _*).schema
    store.put(cfg.targetPath,
      (spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema), batchId))
  }

  def clear(path: String): Unit = store.remove(path)
}
