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

  /** Internal salt column — name-guarded so a caller column can't
    * silently collide with the join key we add.
    */
  val SaltCol = "_graft_salt"

  /** Equi-join with the left (fact) side salted; `inner` (default)
    * and `left`/`left_outer` joins are supported. Left-outer is safe
    * because each left row carries exactly ONE salt value, so an
    * unmatched row null-extends once; right/full outer would emit one
    * null-extended copy of an unmatched right row PER REPLICA and are
    * rejected.
    *
    * The salt is a deterministic hash — no RNG, so task retries and
    * replays land on the same sub-key. By default it hashes the whole
    * left row, which has one blind spot: *identical duplicate rows*
    * hash to the same salt, so a hot key made entirely of identical
    * rows does not split. When the fact table has a unique (or
    * near-unique) column — a row id, an event timestamp, an offset —
    * name it via `saltSource` and duplicates spread uniformly.
    *
    * The right side replicates ×`salt` (dimension-sized, so the
    * replication is the cheap part by construction).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner",
      saltSource: Option[String] = None): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner and left joins only, got: $joinType " +
        "(right/full outer would duplicate unmatched right rows per salt replica)")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"input already has a $SaltCol column — rename it before salting")
    saltSource.foreach { c =>
      require(left.columns.contains(c),
        s"saltSource column '$c' not found in left columns: ${left.columns.mkString(", ")}")
    }
    val saltBasis = saltSource match {
      case Some(c) => Seq(col(c))
      case None    => left.columns.toSeq.map(col)
    }
    val l = left.withColumn(SaltCol,
      pmod(xxhash64(saltBasis: _*), lit(salt.toLong)))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, keys :+ SaltCol, if (jt == "inner") "inner" else "left_outer")
      .drop(SaltCol)
  }
}
