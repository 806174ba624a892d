package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading for CPU-heavy per-row kernels
  * (r14, guide §2.5 "input skew: one huge unsplittable file …
  * repartition immediately after the read" + §2.6 idle capacity).
  *
  * A parquet file written as ONE row group scans as ONE partition no
  * matter how many cores the session has, so every narrow per-row
  * kernel downstream of it (levenshtein DP, LSH hyperplane hashing,
  * n-gram explodes, binary media decode) runs single-task until the
  * first exchange — measured 2×6.6 s single-task stages on
  * dedup_edit_distance at sf0.1/local[32]. `spread` round-robins the
  * rows over `defaultParallelism` (= session cores locally, executor
  * slots on a cluster — never a constant tuned for one box) so the
  * kernel engages every core; the shuffle it pays moves the raw
  * input bytes once and is priced against the kernel it feeds —
  * apply it ONLY where the per-row work dominates that copy.
  *
  * Determinism: keyless repartition round-robins AFTER a local sort
  * (spark.sql.execution.sortBeforeRepartition, on by default), so
  * retries reproduce the same placement; no declared query's RESULT
  * depends on physical partitioning.
  */
object Spread {
  def apply(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Input-size-derived spread (r15, guide §2 "make partitioning
    * scale-adaptive — derive from input size rather than a constant
    * tuned for either local mode or the cluster"): width =
    * clamp(inputBytes / minBytesPerTask, 1, defaultParallelism).
    *
    * The r14 flat `Spread` always used every core; the driver's r14
    * low-core run exposed the cost: a kernel whose input is small
    * (text_bpe_train's corpus re-spread feeding 6 merge rounds) ran
    * 2.7× FASTER at 8 cores than 32, because each extra partition
    * buys ~ms of scheduling/launch per downstream stage while adding
    * no compute that wasn't already sub-task-sized. `minBytesPerTask`
    * floors the per-task work so scheduling overhead stays a small
    * fraction of kernel time; at production inputs the clamp hits
    * defaultParallelism and the behavior is exactly `Spread(df)`.
    * Size comes from Catalyst's plan stats (parquet file bytes for
    * scans — driver metadata, no job); an unknown/degenerate estimate
    * falls back to full parallelism, never below.
    */
  def byBytes(df: DataFrame, minBytesPerTask: Long): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n =
      if (est <= 0 || !est.isValidLong) par
      else math.max(1L, math.min(par.toLong,
        (est.toLong + minBytesPerTask - 1) / minBytesPerTask)).toInt
    df.repartition(n)
  }
}
