package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a derived aggregate table from CDC
  * deltas (the materialized-view side of the reference pipeline: a
  * reporting rollup kept current without recomputing it from the
  * 100 TB fact snapshot on every merge window).
  *
  * Maintains the distributive aggregate vector (row count, long sum)
  * per group — enough for count/sum/avg rollups. The update cost is
  * ∝ |delta| + |aggregate state|, never ∝ |fact table|: the only
  * touch on the big snapshot is the same PK lookup the merge itself
  * performs (broadcast the compacted keys, column-pruned to
  * pk+group+value), and the state update is a join between two
  * small-by-construction tables (adjustments ⟗ groups).
  *
  * min/max are deliberately absent: they are not incrementally
  * maintainable under deletes/updates without a per-group rescan
  * (deleting the current max needs the runner-up) — a pipeline that
  * needs them re-aggregates the affected groups from the snapshot.
  *
  * Reference anchor: the rollup views the reference refreshes after
  * each merge window (merge.sql:520–581 writes per-window counts to
  * the job log; this generalizes that to per-group measures).
  */
object IncrementalAgg {

  /** Initial state: one row per group — `n_rows` (count) and one
    * `sum_<col>` per value column — from a full snapshot scan. Runs
    * once at bootstrap; afterwards only [[applyDelta]] touches it.
    */
  def fromSnapshot(snapshot: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        valueCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  def fromSnapshot(snapshot: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    fromSnapshot(snapshot, groupCols, Seq(valueCol))

  /** Advance the aggregate state across one merge window.
    *
    * `changes` is the compacted change set (`compactForMerge` output:
    * one row per PK, `__op` retained, payload carrying the group and
    * value columns); `preMergeTarget` is the snapshot BEFORE this
    * window's merge (the pipeline holds it anyway — the merge reads
    * it too). Every changed PK retires its old contribution if the
    * row existed (found by the same delta-sized key lookup the merge
    * does), and each upsert adds its new contribution — an update
    * that moves a row between groups decrements one group and
    * increments the other. Groups whose count reaches zero drop out.
    */
  def applyDelta(state: DataFrame, preMergeTarget: DataFrame, changes: DataFrame,
      pkCols: Seq[String], groupCols: Seq[String], valueCols: Seq[String],
      deltaRows: Option[Long]): DataFrame = {
    val keys = changes.select(pkCols.map(col): _*)
    val changedKeys = deltaRows match {
      case Some(nr) if nr <= SnapshotMerge.LargeDeltaRows => broadcast(keys)
      case _ => keys.hint("shuffle_hash")
    }
    // old contributions: target rows being replaced or deleted.
    // Column-pruned to pk+group+values; the semi join never widens or
    // shuffles the target.
    val retired = preMergeTarget
      .select((pkCols ++ groupCols ++ valueCols).distinct.map(col): _*)
      .join(changedKeys, pkCols, "left_semi")
      .select(groupCols.map(col) :+ lit(-1L).as("_dn")
        :++ valueCols.map(c => (-col(c)).as(s"_dsum_$c")): _*)
    val added = changes
      .filter(col(CdcEnvelope.OpCol) =!= lit(CdcEnvelope.Delete))
      .select(groupCols.map(col) :+ lit(1L).as("_dn")
        :++ valueCols.map(c => col(c).as(s"_dsum_$c")): _*)
    val adj = retired.unionByName(added)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_dn")).as("_dn"),
        valueCols.map(c => sum(col(s"_dsum_$c")).as(s"_dsum_$c")): _*)
    // state ⟗ adjustments on the group key: both sides are
    // aggregate-sized (≪ fact table); a full-outer hash join keeps
    // appearing and disappearing groups correct. shuffle_hash: a
    // full outer can't broadcast, and without the hint Catalyst
    // plans SMJ — sorting both sides for a key-equality merge
    // nothing needs sorted.
    state.join(adj.hint("shuffle_hash"), groupCols, "full_outer")
      .select(groupCols.map(col)
        :+ (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n_rows")
        :++ valueCols.map { c =>
          (coalesce(col(s"sum_$c"), lit(0L)) +
            coalesce(col(s"_dsum_$c"), lit(0L))).as(s"sum_$c")
        }: _*)
      .filter(col("n_rows") > 0)
  }

  def applyDelta(state: DataFrame, preMergeTarget: DataFrame, changes: DataFrame,
      pkCols: Seq[String], groupCols: Seq[String], valueCol: String,
      deltaRows: Option[Long] = None): DataFrame =
    applyDelta(state, preMergeTarget, changes, pkCols, groupCols,
      Seq(valueCol), deltaRows)
}
