package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for equi-joins (SURVEY.md §5).
  *
  * A shuffled equi-join places all rows of a key on one task; a key
  * holding 10% of a 100 TB fact table is a straggler that never
  * finishes. Salting splits each fact-side key into `salt` sub-keys
  * and replicates the matching dimension rows across every sub-key —
  * result-identical to the plain join with per-task volume bounded
  * by ~1/salt of the hot key. AQE's skew-join rebalances sort-merge
  * and shuffled-hash skew adaptively; explicit salting remains the
  * tool when AQE can't see the skew (streaming joins, aggregations
  * feeding a join, or a replicated-side build that must stay
  * hash-partitioned).
  */
object Skew {

  /** Inner equi-join with the left (fact) side salted. The salt is a
    * deterministic hash of the whole left row — no RNG, so task
    * retries and replays land on the same sub-key. The right side
    * replicates ×`salt` (dimension-sized, so the replication is the
    * cheap part by construction).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
