package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Newest-change-per-key compaction.
  *
  * The reference ranks with `ROW_NUMBER() OVER (PARTITION BY pk
  * ORDER BY __ts_ns DESC, __source_pos DESC) ... WHERE rn = 1`
  * (bigquery_syntex_merge_sql/merge.sql:309–325, mysql step-8 §6).
  * A window rank shuffles *and sorts* every event. Spark-side we
  * compute the same result as a hash aggregation —
  * `groupBy(pk).agg(max_by(struct(payload), struct(orderCols)))` —
  * which gets map-side partial combine: at 100 TB each task collapses
  * its hot keys locally, so shuffle volume ≈ |distinct keys|, not
  * |events|, and no sort anywhere (SURVEY.md §5). Order keys must be
  * totally ordering (ts + source position) so ties are impossible and
  * the result is deterministic.
  */
object ChangeCompaction {

  /** Newest row per `pkCols` by lexicographic `orderCols`. Keeps
    * every non-key column.
    */
  def latestPerKey(df: DataFrame, pkCols: Seq[String],
      orderCols: Seq[String] = CdcEnvelope.orderCols): DataFrame =
    latestPerKeyOrd(df, pkCols, col(orderCols.head), col(orderCols(1)))

  /** Compaction with explicit (ord1, ord2) bigint ordering columns.
    * LatestByOrder (TypedImperativeAggregate) instead of
    * max_by(struct, struct): the struct-buffer declarative form
    * plans SortAggregate (sorts both sides of the shuffle); this
    * runs in ObjectHashAggregateExec — hash table, map-side partial
    * combine, no sort (see graft.functions.LatestByOrder).
    */
  def latestPerKeyOrd(df: DataFrame, pkCols: Seq[String],
      ord1: Column, ord2: Column): DataFrame = {
    val payload = df.columns.filterNot(pkCols.contains).toSeq
    df.groupBy(pkCols.map(col): _*)
      .agg(graft.functions.LatestByOrder(
        struct(payload.map(col): _*), ord1, ord2).as("_latest"))
      .select(pkCols.map(col) ++ payload.map(c => col("_latest").getField(c).as(c)): _*)
  }

  /** Merge-semantics compaction: the reference applies the newest
    * upsert (log_v_i), then the newest delete only if STRICTLY newer
    * than that upsert (merge.sql:348 `i.ts < d.ts`) — so on an exact
    * timestamp tie between an upsert and a delete, the upsert wins,
    * regardless of source position. Encoded in one pass by packing
    * the tiebreak into the primary order: (ts·2 + isUpsert, pos).
    * (ts is µs < 2^62, so the shift cannot overflow.)
    */
  def compactForMerge(env: DataFrame, pkCols: Seq[String]): DataFrame =
    latestPerKeyOrd(env, pkCols,
      col(CdcEnvelope.TsCol) * lit(2L) +
        when(col(CdcEnvelope.OpCol) =!= lit(CdcEnvelope.Delete), lit(1L)).otherwise(lit(0L)),
      col(CdcEnvelope.PosCol))

  /** The reference's `log_v_i`: newest change per key **among
    * non-deletes** (deletes are excluded before ranking;
    * merge.sql:315).
    */
  def upsertSet(env: DataFrame, pkCols: Seq[String]): DataFrame =
    latestPerKey(env.filter(col(CdcEnvelope.OpCol) =!= lit(CdcEnvelope.Delete)), pkCols)

  /** The reference's `log_v_d`: newest delete per key, dropped when a
    * newer upsert exists for the same key (merge.sql:335–349: delete
    * kept iff no upsert or upsert's ts < delete's ts).
    */
  def deleteSet(env: DataFrame, pkCols: Seq[String]): DataFrame = {
    val dels = latestPerKey(env.filter(col(CdcEnvelope.OpCol) === lit(CdcEnvelope.Delete)), pkCols)
    val ups = upsertSet(env, pkCols)
      .select(pkCols.map(col) :+ col(CdcEnvelope.TsCol).as("_up_ts"): _*)
    dels.join(ups, pkCols, "left")
      .filter(col("_up_ts").isNull || col("_up_ts") < col(CdcEnvelope.TsCol))
      .drop("_up_ts")
  }

  /** One-pass routing (SURVEY.md §5): compact over *all* ops with the
    * merge ordering, then split on `__op`. `routed._1` are rows whose
    * winning change is an upsert, `routed._2` keys whose winning
    * change is a delete. Equivalent to the reference's two-view
    * (log_v_i MERGE, then suppressed log_v_d MERGE) resolution —
    * property-tested in MergeLawsSpec — with one scan, one shuffle,
    * no join.
    */
  def routed(env: DataFrame, pkCols: Seq[String]): (DataFrame, DataFrame) = {
    val latest = compactForMerge(env, pkCols)
    (latest.filter(col(CdcEnvelope.OpCol) =!= lit(CdcEnvelope.Delete)),
      latest.filter(col(CdcEnvelope.OpCol) === lit(CdcEnvelope.Delete)))
  }
}
