package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history maintenance — the history-preserving variant of
  * the reference's snapshot MERGE (merge.sql:403–436 keeps only the
  * newest row per PK; a type-2 dimension keeps EVERY version with its
  * validity interval). Beyond the reference's own surface, included
  * because it is the standard companion capability a warehouse team
  * running that procedure reaches for next, and it falls out of the
  * same envelope/compaction machinery.
  *
  * A history row is (pk…, payload…, valid_from_us, valid_to_us) with
  * NULL valid_to = the current slice. Every change event OPENS a
  * slice at its own timestamp and CLOSES its predecessor at the same
  * instant (half-open intervals, so slices tile with no gaps or
  * overlaps); a delete event closes the current slice and opens none.
  * Event order is (__ts_ns, __source_pos) — the merge's tiebreak.
  *
  * Scale shape: `fromHistory` is one window function over events
  * partitioned by PK (per-PK version chains are short; the shuffle
  * key is the PK, the same key every other CDC stage uses).
  * `applyDelta` touches only the OPEN slices of PKs present in the
  * window — the window's first-event set is delta-sized and
  * broadcasts; closed history is append-only and passes through
  * untouched, so a deployment partitions the stored history by
  * `valid_to_us IS NULL` and the per-run read prunes to the open
  * partition.
  */
object Scd2 {

  private[cdc] val From = "valid_from_us"
  private[cdc] val To = "valid_to_us"

  /** One-shot build of the full type-2 history from a change log.
    * `payloadCols` are carried per slice; deletes contribute closure
    * timestamps only.
    */
  def fromHistory(env: DataFrame, pkCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*)
      .orderBy(col(CdcEnvelope.TsCol), col(CdcEnvelope.PosCol))
    env
      .withColumn(From, col(CdcEnvelope.TsCol))
      // the NEXT event (upsert or delete) closes this slice; computed
      // before deletes drop out so a trailing delete still closes
      .withColumn(To, lead(col(CdcEnvelope.TsCol), 1).over(w))
      .filter(col(CdcEnvelope.OpCol) =!= lit(CdcEnvelope.Delete))
      .select((pkCols ++ payloadCols :+ From :+ To).map(col): _*)
  }

  /** The snapshot as of `tsUs`, reconstructed from the history: the
    * slice containing the instant, per PK (half-open intervals make
    * the containment test exact and non-overlapping). This is
    * timestamp time travel WITHOUT versioned storage — any instant,
    * not just publish points — at the cost of storing every version;
    * a history table partitioned on `valid_to_us IS NULL` serves
    * "current" reads from the open partition and as-of reads with a
    * partition-wide interval filter.
    */
  def asOf(history: DataFrame, tsUs: Long): DataFrame =
    history.filter(col(From) <= lit(tsUs) &&
      (col(To).isNull || col(To) > lit(tsUs)))

  /** Advance a stored history across one merge window: close the open
    * slices of PKs this window touches (at the window's first event
    * time for that PK), append the window's own slices. Equal to
    * `fromHistory` over the concatenated log whenever windows split
    * the log on event time (the watermark contract guarantees it).
    */
  def applyDelta(history: DataFrame, env: DataFrame, pkCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val newSlices = fromHistory(env, pkCols, payloadCols)
    // delta-sized: one row per PK present in this window → broadcasts
    val firstEvt = env.groupBy(pkCols.map(col): _*)
      .agg(min(col(CdcEnvelope.TsCol)).as("_first_ts"))
    val open = history.filter(col(To).isNull)
    val closedNow = open.drop(To)
      .join(broadcast(firstEvt), pkCols)
      .withColumnRenamed("_first_ts", To)
      .select(history.columns.toIndexedSeq.map(col): _*)
    val stillOpen = open.join(broadcast(firstEvt.select(pkCols.map(col): _*)),
      pkCols, "left_anti")
    history.filter(col(To).isNotNull)
      .unionByName(closedNow)
      .unionByName(stillOpen)
      .unionByName(newSlices)
  }
}
