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
  * min/max ARE maintained, but with an honest asymmetry: they are
  * monotone under inserts (`least`/`greatest` fold the delta in with
  * no data read) yet not invertible under deletes — deleting the
  * current extreme needs the runner-up, which only the table knows.
  * The maintenance therefore rescans exactly the groups whose
  * retired rows touched their recorded extreme, reading the
  * post-merge snapshot pruned to those groups (a broadcast semi
  * join; the group set is delta-bounded). A window with no extreme
  * deletions costs the same as the sum/count path.
  *
  * Reference anchor: the rollup views the reference refreshes after
  * each merge window (merge.sql:520–581 writes per-window counts to
  * the job log; this generalizes that to per-group measures).
  */
object IncrementalAgg {

  /** Initial state: one row per group — `n_rows` (count), one
    * `sum_<col>` per value column, one `min_<col>`/`max_<col>` per
    * min/max column — from a full snapshot scan. Runs once at
    * bootstrap; afterwards only [[applyDelta]] touches it.
    */
  def fromSnapshot(snapshot: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], minCols: Seq[String], maxCols: Seq[String]): DataFrame = {
    val measures =
      valueCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c"))
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), measures: _*)
  }

  def fromSnapshot(snapshot: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame =
    fromSnapshot(snapshot, groupCols, valueCols, Nil, Nil)

  def fromSnapshot(snapshot: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    fromSnapshot(snapshot, groupCols, Seq(valueCol), Nil, Nil)

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
      minCols: Seq[String], maxCols: Seq[String],
      postMergeTarget: => DataFrame, deltaRows: Option[Long]): DataFrame = {
    val mmCols = (minCols ++ maxCols).distinct
    val keys = changes.select(pkCols.map(col): _*)
    val changedKeys = deltaRows match {
      case Some(nr) if nr <= SnapshotMerge.LargeDeltaRows => broadcast(keys)
      case _ => keys.hint("shuffle_hash")
    }
    // typed NULL of c's type (never-true CASE), for the union legs
    def nul(df: DataFrame, c: String): Column = when(lit(false), df(c))
    // old contributions: target rows being replaced or deleted.
    // Column-pruned to pk+group+measures; the semi join never widens
    // or shuffles the target.
    val pre = preMergeTarget
      .select((pkCols ++ groupCols ++ valueCols ++ mmCols).distinct.map(col): _*)
    val retired = pre
      .join(changedKeys, pkCols, "left_semi")
      .select(groupCols.map(col) :+ lit(-1L).as("_dn")
        :++ valueCols.map(c => (-col(c)).as(s"_dsum_$c"))
        :++ mmCols.map(c => col(c).as(s"_mm_ret_$c"))
        :++ mmCols.map(c => nul(pre, c).as(s"_mm_ins_$c")): _*)
    val added = changes
      .filter(col(CdcEnvelope.OpCol) =!= lit(CdcEnvelope.Delete))
      .select(groupCols.map(col) :+ lit(1L).as("_dn")
        :++ valueCols.map(c => col(c).as(s"_dsum_$c"))
        :++ mmCols.map(c => nul(changes, c).as(s"_mm_ret_$c"))
        :++ mmCols.map(c => col(c).as(s"_mm_ins_$c")): _*)
    val adjPlan = retired.unionByName(added)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_dn")).as("_dn"),
        valueCols.map(c => sum(col(s"_dsum_$c")).as(s"_dsum_$c"))
          :++ minCols.map(c => min(col(s"_mm_ret_$c")).as(s"_retmin_$c"))
          :++ maxCols.map(c => max(col(s"_mm_ret_$c")).as(s"_retmax_$c"))
          :++ minCols.map(c => min(col(s"_mm_ins_$c")).as(s"_insmin_$c"))
          :++ maxCols.map(c => max(col(s"_mm_ins_$c")).as(s"_insmax_$c")): _*)
    // with min/max the adjustments feed the merged state AND the
    // rescan probe — pin the (delta-group-sized) result so the
    // pre-merge target is scanned exactly once either way
    val adj = if (mmCols.isEmpty) adjPlan else adjPlan.localCheckpoint(true)
    // state ⟗ adjustments on the group key: both sides are
    // aggregate-sized (≪ fact table); a full-outer hash join keeps
    // appearing and disappearing groups correct. shuffle_hash: a
    // full outer can't broadcast, and without the hint Catalyst
    // plans SMJ — sorting both sides for a key-equality merge
    // nothing needs sorted.
    val joined = state.join(adj.hint("shuffle_hash"), groupCols, "full_outer")
    val merged = joined
      .select(groupCols.map(col)
        :+ (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n_rows")
        :++ valueCols.map { c =>
          (coalesce(col(s"sum_$c"), lit(0L)) +
            coalesce(col(s"_dsum_$c"), lit(0L))).as(s"sum_$c")
        }
        // inserts fold in monotonically (least/greatest skip NULLs);
        // deletions of non-extremes leave the extreme untouched
        :++ minCols.map(c => least(col(s"min_$c"), col(s"_insmin_$c")).as(s"min_$c"))
        :++ maxCols.map(c => greatest(col(s"max_$c"), col(s"_insmax_$c")).as(s"max_$c")): _*)
      .filter(col("n_rows") > 0)
    if (mmCols.isEmpty) merged
    else {
      // groups whose RETIRED rows touched their recorded extreme are
      // the only ones whose min/max is uncertain: rescan exactly
      // those from the post-merge snapshot, pruned by a broadcast
      // semi join (the rescan set is delta-bounded; most windows
      // retire no extremes and skip this branch entirely)
      val rescanCond = (minCols.map(c => col(s"_retmin_$c") <= col(s"min_$c"))
        :++ maxCols.map(c => col(s"_retmax_$c") >= col(s"max_$c")))
        .map(e => coalesce(e, lit(false)))
        .reduce(_ || _)
      val rescan = joined.filter(rescanCond)
        .select(groupCols.map(col): _*).localCheckpoint(true)
      if (rescan.isEmpty) merged
      else {
        val exact = fromSnapshot(
          postMergeTarget.join(broadcast(rescan), groupCols, "left_semi"),
          groupCols, valueCols, minCols, maxCols)
        merged.join(broadcast(rescan), groupCols, "left_anti").unionByName(exact)
      }
    }
  }

  def applyDelta(state: DataFrame, preMergeTarget: DataFrame, changes: DataFrame,
      pkCols: Seq[String], groupCols: Seq[String], valueCols: Seq[String],
      deltaRows: Option[Long]): DataFrame =
    applyDelta(state, preMergeTarget, changes, pkCols, groupCols, valueCols,
      Nil, Nil, sys.error("postMergeTarget is only read for min/max rollups"), deltaRows)

  def applyDelta(state: DataFrame, preMergeTarget: DataFrame, changes: DataFrame,
      pkCols: Seq[String], groupCols: Seq[String], valueCol: String,
      deltaRows: Option[Long] = None): DataFrame =
    applyDelta(state, preMergeTarget, changes, pkCols, groupCols,
      Seq(valueCol), deltaRows)
}
