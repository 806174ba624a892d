package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A86 — row/column security policies on the store read path (the
  * Delta/Unity row-filter + column-mask surface; reference anchor:
  * the reference serves its merged snapshots to downstream consumers
  * with no redaction story at all — merge.sql publishes raw typed
  * columns — so any multi-tenant deployment needs exactly this
  * wrapper).
  *
  * Contract:
  *
  *  - `rowFilter` is a SQL predicate evaluated on RAW rows, BEFORE
  *    any mask — it sits directly over the scan so Catalyst pushes
  *    it into parquet (manifest-stat bucket pruning and row-group
  *    skipping keep working under a policy read).
  *  - `masks` map column → SQL expression. A mask sees the RAW row
  *    (it may reference other columns — region-dependent redaction),
  *    never another mask's output: no cascade-order dependence. The
  *    result is cast back to the column's stored type — a policy
  *    must not change the schema a consumer compiled against.
  *  - Masking an unknown column refuses loudly (a typo'd policy that
  *    silently masked nothing would be a security hole, not a
  *    convenience).
  *
  * Pure projection+filter plan work: zero extra shuffles, zero extra
  * scans, codegen'd like any other derived column; at 100 TB a
  * policy read costs what the underlying read costs.
  */
final case class SecurityPolicy(
    rowFilter: Option[String] = None,
    masks: Map[String, String] = Map.empty)

object Security {

  /** The policy applied to an arbitrary DataFrame (the composable
    * core — views, snapshots, time travel, change feeds all take the
    * same wrapper).
    */
  def securedView(df: DataFrame, policy: SecurityPolicy): DataFrame = {
    val unknown = policy.masks.keySet -- df.columns.toSet
    require(unknown.isEmpty,
      s"mask on unknown column(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val filtered = policy.rowFilter.fold(df)(df.filter)
    filtered.select(df.columns.map { c =>
      policy.masks.get(c)
        .map(m => expr(m).cast(df.schema(c).dataType).as(c))
        .getOrElse(col(c))
    }: _*)
  }

  /** The store's current snapshot under a policy; None when the store
    * has no committed version (same contract as readSnapshot).
    */
  def readSecured(spark: SparkSession, targetDir: String,
      policy: SecurityPolicy): Option[DataFrame] =
    CdcPipeline.readSnapshot(spark, targetDir).map(securedView(_, policy))
}
