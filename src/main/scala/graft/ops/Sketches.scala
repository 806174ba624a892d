package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental distinct-count maintenance (SURVEY.md §2 C19) with
  * mergeable HLL sketches (Spark's datasketches-backed hll_* family).
  *
  * The CDC pipeline's run log stores one small binary sketch per
  * (group, window); a distinct-count over ANY span of history is
  * then a union of its windows' sketches — no re-scan of 100 TB of
  * history per run, which is what count(DISTINCT) would do. HLL
  * register updates are max-operations: order-insensitive and
  * merge-exact, so union(sketch(A), sketch(B)) is bit-identical to
  * sketch(A ∪ B) — windowed maintenance loses nothing vs a one-shot
  * build.
  */
object Sketches {

  /** One binary HLL sketch per group over this window's rows. */
  def sketchBy(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(value).as("hll"))

  /** Merge per-window sketches back to an estimate per group. */
  def unionEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_distinct"))
}
