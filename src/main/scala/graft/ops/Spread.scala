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
}
