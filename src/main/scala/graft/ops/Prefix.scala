package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global 1-based dense rank over a total order WITHOUT a single-task
  * window — the C74 partition-wise prefix (`Packing
  * .materializePositions`, `Vocab.vocabGrowthCurve`) factored into the
  * one helper every "row_number() over a global ORDER BY" call site
  * should use instead of `Window.orderBy(...)` (which Spark plans as
  * ONE WindowExec task over the whole relation — the r11 C119 defect,
  * and the r12 listener-audit findings on C52/C73/C75):
  *
  *  1. range-partition + local sort on the order key — a normal
  *     distributed sort, every partition ∝ rows/partitions;
  *  2. per-partition row counts collected as ≤ shuffle-partitions
  *     rows (driver-sized by construction);
  *  3. a driver prefix over those counts, broadcast back as offsets;
  *  4. rank = per-partition `row_number()` (one task per partition,
  *     never one task total) + the partition's offset.
  *
  * `sort` must be a TOTAL order (include a unique tie-break column):
  * equal keys land in one range partition, but their intra-partition
  * order would otherwise be nondeterministic. Returns the ranked
  * frame plus the total row count (free — the sum of the collected
  * partition counts), which rank consumers (ntile cuts, coverage
  * denominators) always need next.
  *
  * Durability (cluster form): `localCheckpoint()` pins the sorted
  * relation to executor-local block storage — the right trade on
  * local[N] and on healthy clusters (no HDFS round-trip), but a lost
  * executor fails the job because its blocks are unrecoverable. On a
  * long-running 1000-executor job where executor loss is routine,
  * switch to a reliable `checkpoint()` (with
  * `sparkContext.setCheckpointDir` on HDFS/S3) — same plan-cutting
  * semantics, replicated storage, survives executor loss at the cost
  * of one distributed write. Same trade as the PageRank iterate note
  * in `ops/Graphs.scala`.
  */
object Prefix {
  private val TempCols = Seq("__pid", "__lrn", "__rn0")

  def globalRank(df: DataFrame, rankName: String,
      sort: Seq[Column]): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    // Reserved working columns: silently overwriting an input column
    // named __pid/__lrn/__rn0 would corrupt both the rank and the
    // caller's data — fail fast instead (callers control their
    // schemas; none of the repo's relations use the __ prefix).
    val clash = TempCols.filter(df.columns.contains)
    require(clash.isEmpty,
      s"globalRank: input already has reserved column(s) ${clash.mkString(", ")}")
    // shuffle.partitions can legally be non-numeric ("auto" on some
    // vendors' runtimes); fall back to the relation's own partition
    // count rather than throwing in a library helper.
    val np = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(math.max(df.rdd.getNumPartitions, 1))
    val sorted = df.repartitionByRange(np, sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy("__pid").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = parts.iterator.map(_._2).sum
    var acc = 0L
    val offs = parts.map { case (pid, n) =>
      val o = (pid, acc); acc += n; o
    }.toSeq
    val offDf = broadcast(offs.toDF("__pid", "__rn0"))
    val lw = Window.partitionBy("__pid").orderBy(sort: _*)
    val ranked = sorted
      .withColumn("__lrn", row_number().over(lw).cast("long"))
      .join(offDf, Seq("__pid"))
      .withColumn(rankName, col("__lrn") + col("__rn0"))
      .drop("__pid", "__lrn", "__rn0")
    (ranked, total)
  }

  /** `ntile(n)` phase from a [[globalRank]] rank — the exact SQL
    * ntile cut (first `total mod n` groups get the extra row) as a
    * map-side expression, no window: with q = total div n and
    * r = total mod n, ranks 1..r·(q+1) split into groups of q+1 and
    * the rest into groups of q.
    */
  def ntileFromRank(rankCol: String, n: Int, total: Long): Column = {
    val q = total / n
    val r = total % n
    val cut = r * (q + 1)
    if (q == 0) col(rankCol) // fewer rows than groups: rank = group
    else expr(
      s"CASE WHEN $rankCol <= $cut THEN ($rankCol - 1) div ${q + 1} + 1" +
      s" ELSE $r + ($rankCol - $cut - 1) div $q + 1 END")
  }
}
