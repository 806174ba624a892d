package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data-quality expectations with quarantine — the
  * DLT-style `expect` / `expect_or_drop` / `expect_or_fail` surface
  * (and Delta CHECK constraints), generalizing the reference's
  * all-or-nothing failure logging (merge.sql:441–457 logs a FAILED
  * run and rolls the whole batch back; an expectation lets the
  * pipeline keep the good rows, divert the bad ones, and still
  * account for every input row).
  *
  * Semantics:
  *  - A row VIOLATES an expectation when its predicate evaluates
  *    false OR NULL (a quality gate must not pass rows it cannot
  *    judge; SQL CHECK's null-passes convention is the wrong default
  *    for pipelines — matches DLT).
  *  - [[Warn]] violations are counted but the row stays in the clean
  *    output. [[Drop]] rows leave silently (counted). [[Quarantine]]
  *    rows are diverted with the full list of violated expectation
  *    names. [[Fail]] aborts the batch before anything is written.
  *  - A row violating several expectations takes the strongest
  *    action (Fail > Quarantine > Drop > Warn) and its quarantine
  *    record carries EVERY violated name, warn ones included — the
  *    debugging view wants the whole diagnosis, not the verdict.
  *
  * Scale shape: one codegen'd projection computes the per-row
  * violated-name array (no UDFs, no extra shuffle — the predicates
  * ride the same scan that feeds the merge), and the split is two
  * filters over it. Violation counts are ONE conditional-aggregate
  * pass (the B28 FILTER-clause shape), |expectations| cells — never
  * a pass per expectation.
  */
object Expectations {

  sealed trait Action
  /** Count the violation, keep the row. */
  case object Warn extends Action
  /** Remove the row from the clean output, silently (counted). */
  case object Drop extends Action
  /** Remove the row and divert it, with its violated names. */
  case object Quarantine extends Action
  /** Reject the whole batch if any row violates. */
  case object Fail extends Action

  /** One named expectation: `predicate` is a Spark SQL boolean
    * expression over the input columns (e.g. `"value >= 0"`,
    * `"event_type IN ('click','view')"`).
    */
  final case class Expectation(name: String, predicate: String,
      action: Action = Quarantine) {
    require(name.matches("[A-Za-z0-9_-]+"), s"expectation name must be path-safe: $name")
    /** True when the row passes (false/NULL predicate = violation). */
    private[cdc] def passes: Column = coalesce(expr(predicate), lit(false))
  }

  /** Column carrying the sorted violated-expectation names on
    * annotated / quarantined rows.
    */
  val ViolationsCol = "_violations"

  final case class Split(clean: DataFrame, quarantined: DataFrame)

  /** Batch rejected by a [[Fail]] expectation. */
  final class ExpectationFailedException(val table: String, val counts: Map[String, Long])
    extends RuntimeException(
      s"expectations failed for $table: " +
        counts.toSeq.sortBy(_._1).map { case (n, c) => s"$n=$c" }.mkString(", "))

  /** The input with [[ViolationsCol]] appended: a sorted array of the
    * names of every expectation the row violates (empty = clean row).
    * One codegen'd projection, no shuffle.
    */
  def annotate(df: DataFrame, specs: Seq[Expectation]): DataFrame = {
    require(specs.map(_.name).distinct.size == specs.size,
      "expectation names must be unique")
    df.withColumn(ViolationsCol, array_sort(array_compact(
      array(specs.map(e => when(!e.passes, lit(e.name))): _*))))
  }

  /** Split the input into the clean set (violates no Drop/Quarantine/
    * Fail expectation — Warn violations stay) and the quarantine set
    * (violates ≥1 [[Quarantine]] expectation, carrying ALL its
    * violated names). Rows violating only [[Drop]] expectations
    * appear in neither. [[Fail]] handling is the caller's
    * (see [[check]]): here Fail rows simply leave the clean set so a
    * caller that already checked cannot double-publish them.
    */
  def split(df: DataFrame, specs: Seq[Expectation]): Split = {
    val ann = annotate(df, specs)
    def overlaps(names: Seq[String]): Column =
      if (names.isEmpty) lit(false)
      else arrays_overlap(col(ViolationsCol), lit(names.toArray))
    val removing = specs.filter(_.action != Warn).map(_.name)
    val diverted = specs.filter(_.action == Quarantine).map(_.name)
    Split(
      clean = ann.filter(!overlaps(removing)).drop(ViolationsCol),
      quarantined = ann.filter(overlaps(diverted)))
  }

  /** Per-expectation violation counts in ONE conditional-aggregate
    * pass over one scan (never a job per expectation). Returns the
    * single-row result as a map.
    */
  def violationCounts(df: DataFrame, specs: Seq[Expectation]): Map[String, Long] = {
    require(specs.nonEmpty, "no expectations declared")
    val row = df.agg(
      sum(when(!specs.head.passes, 1L).otherwise(0L)).as(specs.head.name),
      specs.tail.map(e => sum(when(!e.passes, 1L).otherwise(0L)).as(e.name)): _*
    ).collect()(0)
    specs.map(e => e.name -> (if (row.isNullAt(row.fieldIndex(e.name))) 0L
      else row.getLong(row.fieldIndex(e.name)))).toMap
  }

  /** Enforce [[Fail]] expectations: throws [[ExpectationFailedException]]
    * (with every expectation's violation count, for the log) when any
    * Fail-actioned expectation has a violating row. One aggregate
    * pass; skipped entirely when nothing is Fail-actioned.
    */
  def check(df: DataFrame, specs: Seq[Expectation], table: String): Unit = {
    val failing = specs.filter(_.action == Fail)
    if (failing.nonEmpty) {
      val counts = violationCounts(df, specs)
      if (failing.exists(e => counts(e.name) > 0))
        throw new ExpectationFailedException(table, counts)
    }
  }
}
