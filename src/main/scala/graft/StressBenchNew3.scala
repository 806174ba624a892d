package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r9 final-batch scale probes (A82 replication) — runnable
  * standalone (`sbt 'runMain graft.StressBenchNew3 [multiplier]'`)
  * and invoked from the full [[StressBench]] protocol. Claim probed:
  *
  *  - replication: after bootstrap, converging the replica to a
  *    5-key source commit is priced ∝ the DELTA — the replica commit
  *    rewrites only the keys' buckets and writes a small fraction of
  *    the bootstrap bytes; a current replica's noop poll is
  *    metadata-only (no Spark job).
  */
object StressBenchNew3 {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, 100000L * mult)
    spark.stop()
  }

  def run(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    import graft.cdc.{CdcEnvelope, CdcPipeline => P, CdcTableConfig, Replication, StoreFs}
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // A82: replicate a 10M-row / 64-bucket store, then converge a
    // 5-key source commit. The incremental replica commit must be
    // delta-priced: ≤ 5 rewritten buckets, bytes ≪ bootstrap.
    {
      val src = java.nio.file.Files.createTempDirectory("stress-repl-s").toString
      val dst = java.nio.file.Files.createTempDirectory("stress-repl-d").toString + "/r"
      val rows = spark.range(0, n).select(col("id"), (col("id") % 997L).as("v"))
      P.publish(rows, src, Seq("id"), buckets = Some(64))
      val (_, tBoot) = secs { Replication.replicate(spark, src, dst, Seq("id")).get }
      val bootBytes = StoreFs.treeBytes(s"$dst/v0")

      val cfg = CdcTableConfig(
        cdcTable = "t", sourcePath = "s", targetDb = "g", targetTable = "r",
        targetPath = src, pk = Seq("id"), fieldSpecs = Nil,
        passthrough = Seq("v"), numBuckets = Some(64))
      val delta = Seq.tabulate(5)(i => (i * 1000L + 1L, 7777777L, CdcEnvelope.Upsert))
        .toDF("id", "v", CdcEnvelope.OpCol)
      P.mergeAndPublish(spark, cfg, delta, 5L) // src v1
      val (r1, tInc) = secs { Replication.replicate(spark, src, dst, Seq("id")).get }
      val m1 = P.manifest(dst, r1.dstVersion).get
      val rewritten = m1.buckets.values.count(_ == s"v${r1.dstVersion}")
      val incBytes = StoreFs.treeBytes(s"$dst/v${r1.dstVersion}")
      assert(r1.mode == "incremental" && rewritten <= 5,
        s"5-key replication must rewrite <=5 buckets, got $rewritten")
      val (r2, tNoop) = secs { Replication.replicate(spark, src, dst, Seq("id")).get }
      assert(r2.mode == "noop")
      println(f"[stress] replication on ${n / 1e6}%.1f M rows/64 buckets: " +
        f"bootstrap $tBoot%.1f s ($bootBytes b), 5-key converge $tInc%.1f s " +
        f"($rewritten/64 buckets, $incBytes b = ${incBytes * 100.0 / bootBytes}%.2f%% " +
        f"of bootstrap), noop poll $tNoop%.3f s")
      StoreFs.deleteRecursive(src); StoreFs.deleteRecursive(dst)
    }
  }
}
