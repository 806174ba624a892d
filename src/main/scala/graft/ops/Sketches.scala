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

  // === Incremental quantile maintenance (SURVEY.md §2 C33) ===
  //
  // The quantile analogue of the HLL family above: an EXACTLY-
  // mergeable fixed-range histogram sketch. Each window stores ≤
  // `bins` exact bin counts per group; counts merge by addition, so
  // windowed maintenance is lossless — merge(hist(A), hist(B)) ≡
  // hist(A ∪ B) bit-for-bit, unlike GK/KLL whose merge grows error.
  // Any quantile over any span of history then reads O(groups·bins)
  // sketch rows instead of rescanning the raw history, with error
  // provably < one bin width (the estimate is the containing bin's
  // upper edge, and the k-th smallest value lies inside that bin).
  // The [lo, hi) range is a config contract like any histogram's;
  // out-of-range values clamp into the edge bins (detectable as edge
  // mass), keeping merge totals exact.

  /** One histogram sketch per group over this window's rows:
    * (groupCols…, bin, n). `value` should be integral (e.g. cents).
    */
  def histSketch(df: DataFrame, groupCols: Seq[String], value: Column,
      lo: Long, hi: Long, bins: Int): DataFrame = {
    require(hi > lo && bins > 0, s"bad histogram config [$lo, $hi) / $bins")
    val width = (hi - lo).toDouble / bins
    df.select(groupCols.map(col) :+ least(lit(bins - 1), greatest(lit(0),
        floor((value - lit(lo)) / lit(width)).cast("int"))).as("bin"): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge any number of per-window sketches: bin counts add. */
  def histMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Upper-edge estimate of the q-quantile (the k-th smallest with
    * k = ceil(q·n)) per group from a (merged) sketch: the first bin
    * whose cumulative count reaches k. Per-group work is a fold over
    * ≤ `bins` collected rows — sketch-sized, never data-sized.
    * Returns (groupCols…, total, q_est).
    */
  def histQuantile(sketch: DataFrame, groupCols: Seq[String], q: Double,
      lo: Long, hi: Long, bins: Int): DataFrame = {
    val width = (hi - lo).toDouble / bins
    sketch.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("bin"), col("n")))).as("h"),
        sum(col("n")).as("total"))
      .select(groupCols.map(col) :+ col("total") :+ expr(
        s"""aggregate(h,
           |  named_struct('cum', CAST(0 AS BIGINT), 'bin', CAST(-1 AS INT)),
           |  (acc, x) -> IF(acc.bin >= 0, acc,
           |    named_struct('cum', acc.cum + x.n,
           |      'bin', IF(acc.cum + x.n >= CAST(ceil($q * total) AS BIGINT),
           |        x.bin, CAST(-1 AS INT)))),
           |  acc -> acc.bin)""".stripMargin).as("qbin"): _*)
      .select(groupCols.map(col) :+ col("total")
        :+ (lit(lo.toDouble) + (col("qbin") + 1) * lit(width)).as("q_est"): _*)
  }
}
