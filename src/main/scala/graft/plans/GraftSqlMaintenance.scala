package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.cdc.CdcPipeline

/** Statement-level maintenance SQL on the versioned store (A92, r10)
  * — the verbs Delta exposes as statements but Spark's grammar does
  * not know, completing the [[GraftSqlDml]] (DML) + [[GraftSqlDdl]]
  * (DDL) surface:
  *
  *   OPTIMIZE graft.`/p`                       -- A40, pk-clustered
  *   OPTIMIZE graft.`/p` ZORDER BY (a, b)      -- A43
  *   VACUUM graft.`/p` [RETAIN n VERSIONS] [DRY RUN]   -- A62/A68
  *   DESCRIBE HISTORY graft.`/p`               -- A45
  *   RESTORE TABLE graft.`/p` TO VERSION AS OF n       -- A47
  *
  * Design: these words would THROW in the delegate parser (they are
  * not ANSI and not Spark grammar — Delta injects its own grammar for
  * exactly this reason), so unlike the DML/DDL paths this is a
  * FRONT-parse: a statement-shaped regex over the raw text runs
  * BEFORE delegation, claims ONLY statements that both start with one
  * of these verbs and target a backticked graft.{path}, and falls
  * through to the session parser otherwise — Spark's own
  * DESCRIBE/EXPLAIN/… behavior is untouched. Each match becomes the
  * usual lazy `LeafRunnableCommand` over the existing Scala op (one
  * implementation; Scala API, TVF, and statement veneers), executing
  * eagerly on `spark.sql(…)` like every command.
  *
  * The RETAIN unit is VERSIONS, not Delta's hours — retention in this
  * store is version-addressed (SURVEY §2 A62 keeps time-based
  * expiration a separate op), and pretending hours here would imply a
  * clock the vacuum walk does not consult.
  */
object GraftSqlMaintenance {

  private val optimizeRe =
    """(?is)^\s*OPTIMIZE\s+graft\.`([^`]+)`\s*(?:ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val vacuumRe =
    """(?is)^\s*VACUUM\s+graft\.`([^`]+)`(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val historyRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+graft\.`([^`]+)`\s*;?\s*$""".r
  private val restoreRe =
    """(?is)^\s*RESTORE\s+TABLE\s+graft\.`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val restoreTsRe =
    """(?is)^\s*RESTORE\s+TABLE\s+graft\.`([^`]+)`\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  private val cloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+graft\.`([^`]+)`\s+(SHALLOW|DEEP)\s+CLONE\s+graft\.`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""".r

  /** Some(command) when `sqlText` is a maintenance statement on a
    * graft store; None to delegate to the session parser.
    */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case optimizeRe(path, zcols) =>
      val z = Option(zcols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      Some(GraftOptimizeCommand(path, z))
    case vacuumRe(path, retain, dry) =>
      val keep = Option(retain).map(_.toInt).getOrElse(2)
      Some(GraftVacuumCommand(path, keep, dryRun = dry != null))
    case historyRe(path) => Some(GraftHistoryCommand(path))
    case restoreRe(path, v) => Some(GraftRestoreCommand(path, v.toLong))
    case restoreTsRe(path, ts) =>
      Some(GraftRestoreTsCommand(path, ts))
    case cloneRe(dst, mode, src, ver) =>
      Some(GraftCloneCommand(src, dst, deep = mode.equalsIgnoreCase("DEEP"),
        atVersion = Option(ver).map(_.toLong)))
    case _ => None
  }

  private def longAttr(n: String, nul: Boolean = false) =
    AttributeReference(n, LongType, nullable = nul)()

  /** OPTIMIZE: ZORDER BY → A43 z-curve clustering; bare → A40
    * clustering by the `_PK` sidecar key (the store's only ordered
    * identity — the analogue of Delta's bin-packing default, but
    * producing pk-range-prunable files instead of arbitrary packs).
    * Emits the published version; no row when the store has none.
    */
  final case class GraftOptimizeCommand(path: String, zCols: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(longAttr("version"))
    override def run(spark: SparkSession): Seq[Row] = {
      val pk = CdcPipeline.pkColumns(path).getOrElse(throw new IllegalArgumentException(
        s"no _PK sidecar at $path — OPTIMIZE needs a store created by this engine " +
          "(CTAS with TBLPROPERTIES('pk'=...) or any pipeline publish)"))
      val v = if (zCols.isEmpty) CdcPipeline.optimize(spark, path, pk, sortCols = pk)
        else CdcPipeline.optimizeZorder(spark, path, pk, zCols)
      v.map(Row(_)).toSeq
    }
  }

  /** VACUUM [RETAIN n VERSIONS] [DRY RUN]: dry run lists what WOULD
    * go (version, bytes) without touching anything (A68); the real
    * thing returns the versions reclaimed (A62's walk — kept versions
    * stay fully readable including carried-bucket references).
    */
  final case class GraftVacuumCommand(path: String, keep: Int, dryRun: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      if (dryRun) Seq(longAttr("version"), longAttr("bytes"))
      else Seq(longAttr("version"))
    override def run(spark: SparkSession): Seq[Row] =
      if (dryRun) CdcPipeline.vacuumPreview(path, keep).map { case (v, b) => Row(v, b) }
      else CdcPipeline.vacuum(path, keep).map(Row(_))
  }

  /** DESCRIBE HISTORY: the A45 commit log (footer-sized, metadata
    * I/O only), newest first.
    */
  final case class GraftHistoryCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      longAttr("version"), AttributeReference("op", StringType)(),
      longAttr("commit_us"),
      AttributeReference("num_buckets", IntegerType, nullable = false)(),
      AttributeReference("rewritten_buckets", IntegerType, nullable = false)(),
      AttributeReference("carried_buckets", IntegerType, nullable = false)(),
      longAttr("rows", nul = true), longAttr("bytes", nul = true))
    override def run(spark: SparkSession): Seq[Row] =
      CdcPipeline.describeHistory(spark, path).map { df =>
        df.selectExpr("CAST(version AS BIGINT) AS version", "op",
          "CAST(commit_us AS BIGINT) AS commit_us",
          "CAST(num_buckets AS INT) AS num_buckets",
          "CAST(rewritten_buckets AS INT) AS rewritten_buckets",
          "CAST(carried_buckets AS INT) AS carried_buckets",
          "CAST(rows AS BIGINT) AS rows",
          "CAST(bytes AS BIGINT) AS bytes").collect().toSeq
      }.getOrElse(Seq.empty)
  }

  /** RESTORE TABLE … TO TIMESTAMP AS OF 'ts' — the A67 time axis
    * composed with A47's restore: the version serving at `ts`
    * (latest commit_us ≤ ts — the same placement rule
    * readSnapshotAsOfTime uses, including its unplaceable-version
    * honesty) becomes a NEW current version. Accepts epoch
    * MICROSECONDS or UTC 'yyyy-MM-dd[ HH:mm[:ss]]'.
    */
  final case class GraftRestoreTsCommand(path: String, ts: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(longAttr("version"))
    override def run(spark: SparkSession): Seq[Row] = {
      val tsUs =
        if (ts.forall(_.isDigit)) ts.toLong
        else {
          val norm = ts.trim.replace('T', ' ')
          val ldt =
            if (norm.contains(" ")) java.time.LocalDateTime.parse(
              norm, java.time.format.DateTimeFormatter.ofPattern(
                if (norm.count(_ == ':') == 2) "yyyy-MM-dd HH:mm:ss"
                else "yyyy-MM-dd HH:mm"))
            else java.time.LocalDate.parse(norm).atStartOfDay()
          ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        }
      CdcPipeline.versionAsOfTime(path, tsUs)
        .flatMap(CdcPipeline.restoreSnapshot(path, _))
        .map(Row(_)).toSeq
    }
  }

  /** CREATE TABLE dst SHALLOW|DEEP CLONE src [VERSION AS OF n] —
    * A37's zero-copy snapshot clone as Delta's statement: SHALLOW
    * references the source's bucket files through a pin the source's
    * vacuum honors; DEEP copies them. Emits the clone's version (0 —
    * a clone's timeline restarts).
    */
  final case class GraftCloneCommand(src: String, dst: String,
      deep: Boolean, atVersion: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(longAttr("version"))
    override def run(spark: SparkSession): Seq[Row] =
      CdcPipeline.cloneSnapshot(src, dst, deep, atVersion).map(Row(_)).toSeq
  }

  /** RESTORE TABLE … TO VERSION AS OF n: A47 — a NEW version whose
    * manifest references the restored state (history is append-only;
    * nothing is deleted by going back). Emits the new version; no row
    * when the target version is unknown or vacuumed.
    */
  final case class GraftRestoreCommand(path: String, version: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(longAttr("version"))
    override def run(spark: SparkSession): Seq[Row] =
      CdcPipeline.restoreSnapshot(path, version).map(Row(_)).toSeq
  }
}
