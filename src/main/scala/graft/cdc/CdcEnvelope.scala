package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The canonical change-event envelope.
  *
  * The reference's CDC rows carry a JSON `data` payload with every
  * source column plus Debezium-style metadata — `__op` (c/u/r =
  * upsert, d = delete), `__ts_ns` (source commit time), and
  * `__source_pos` (binlog position, the total tiebreak) — and an
  * envelope-level load timestamp used for incremental windowing
  * (reference: bigquery_syntex_merge_sql/merge.sql:307–349,
  * merge_procedures_mysql/step-8-etl_job_incremental-date.sql §6).
  *
  * Spark-side we normalize any change source into a DataFrame with:
  *   - the PK columns (already extracted, typed),
  *   - `__op`       string: 'u' (any upsert flavor) | 'd'
  *   - `__ts_us`    bigint: source event time, microseconds
  *   - `__pos`      bigint: total-order tiebreak within a key
  *   - `load_ts_us` bigint: pipeline load time, microseconds (window key)
  *   - `data`       string: the JSON payload for TypedProjection
  *   - any passthrough payload columns the sink schema wants.
  *
  * Times are microseconds everywhere: nanosecond inputs are floor-
  * divided (`div 1000`), which matches how µs-resolution engines
  * (DuckDB, BigQuery) truncate nanosecond parquet timestamps.
  */
object CdcEnvelope {
  val OpCol = "__op"
  val TsCol = "__ts_us"
  val PosCol = "__pos"
  val LoadTsCol = "load_ts_us"
  val DataCol = "data"

  val Delete = "d"
  val Upsert = "u"

  /** Standard envelope ordering for "newest change wins": event time,
    * then source position (reference orders by __ts_ns DESC,
    * __source_pos DESC; merge.sql:310).
    */
  val orderCols: Seq[String] = Seq(TsCol, PosCol)

  /** Canonical mapping of the driver's `events` table into the
    * envelope (SURVEY.md §4): PK = user_id, deletes = 'error' events,
    * event time = ts (bigint nanos → µs), position = event_id,
    * payload = props. `value` and `event_id` ride along as payload.
    */
  /** ns → µs floor division. `ts div 1000` truncates toward zero,
    * which diverges from DuckDB's ns→µs timestamp floor for pre-1970
    * times; pmod-adjusted floor matches for ALL ts, and makes the
    * eventsWindowed range rewrite an exact equivalence (not just for
    * ts >= 0).
    */
  def nsToUs(colName: String): Column =
    expr(s"($colName - pmod($colName, 1000)) div 1000")

  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      when(col("event_type") === lit("error"), lit(Delete)).otherwise(lit(Upsert)).as(OpCol),
      nsToUs("ts").as(TsCol),
      col("event_id").as(PosCol),
      nsToUs("ts").as(LoadTsCol),
      col("props").as(DataCol),
      col("event_id"),
      col("event_type"),
      col("value"))

  /** Epoch microseconds for an ISO UTC instant — window literals. */
  def epochUs(isoUtc: String): Long =
    java.time.Instant.parse(isoUtc).toEpochMilli * 1000L

  /** Incremental window filter: load_ts ∈ (startUs, endUs]. The
    * half-open interval is the reference's watermark contract
    * (merge.sql:313–314: `bq_load_ts > start AND bq_load_ts <= end`).
    * On a date-partitioned source the same predicate on the partition
    * column prunes files (the Spark analogue of step-8's explicit
    * PARTITION(p050..) list).
    */
  def window(env: DataFrame, startUs: Long, endUs: Long): DataFrame =
    env.filter(col(LoadTsCol) > lit(startUs) && col(LoadTsCol) <= lit(endUs))

  /** UTC day (yyyy-MM-dd) of an epoch-µs instant — partition literals. */
  def dayOfUs(us: Long): String =
    java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** Window filter + day-partition pruning: when the source is laid
    * out by a date partition column (config `partition_field`), the
    * window predicate additionally bounds that column so Catalyst
    * prunes partition directories — the Spark analogue of the
    * reference's explicit `PARTITION (p050,...)` list
    * (step-8-etl_job_incremental-date.sql:352–376). The day bounds
    * are the closure of (startUs, endUs]: every load_ts in the window
    * falls on a day in [day(startUs), day(endUs)], so adding the
    * partition bound never drops window rows. ISO yyyy-MM-dd compares
    * correctly as string or date.
    */
  def window(env: DataFrame, startUs: Long, endUs: Long,
      partitionField: Option[String]): DataFrame = {
    val base = window(env, startUs, endUs)
    partitionField match {
      case Some(p) =>
        base.filter(col(p) >= lit(dayOfUs(startUs)) && col(p) <= lit(dayOfUs(endUs)))
      case None => base
    }
  }

  /** Window + events→envelope in one step, with the window predicate
    * on the RAW nanosecond column: `floorDiv(ts,1000) > s` is a
    * function of the column and never reaches the parquet scan
    * (PushedFilters shows only IsNotNull), while the equivalent
    * `ts >= (s+1)*1000 AND ts < (e+1)*1000` is a plain range that
    * pushes down — at 100 TB the difference between scanning the
    * window and scanning the history. (Same idea as the reference's
    * explicit PARTITION(p050..) pruning, step-8 §5a.) With floor
    * division the rewrite is exact for all ts, negatives included.
    */
  def eventsWindowed(events: DataFrame, startUs: Long, endUs: Long): DataFrame =
    fromEvents(events.filter(
      col("ts") >= lit((startUs + 1) * 1000L) && col("ts") < lit((endUs + 1) * 1000L)))
}
