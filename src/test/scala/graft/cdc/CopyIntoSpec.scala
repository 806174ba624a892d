package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import java.nio.file.Files

/** A75: COPY INTO — idempotent bulk file ingestion. Laws: fresh
  * files upsert by PK; already-ingested files are skipped with ZERO
  * Spark jobs; the file identity is path+size (a re-landed changed
  * file re-ingests); a crash between publish and markers re-merges
  * to the SAME state (exactly-once effect); in-batch duplicate PKs
  * and schema drift refuse loudly with the store untouched.
  */
class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-copy").toString

  private def writeLanding(dir: String, name: String,
      rows: Seq[(Long, Long)]): String = {
    val stage = Files.createTempDirectory("graft-stage").toString
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = StoreFs.listFilePaths(stage, ".parquet").head
    val dst = s"$dir/$name"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.copy(java.nio.file.Paths.get(new java.net.URI(
      if (part.startsWith("file:")) part else s"file:$part")),
      java.nio.file.Paths.get(dst),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    StoreFs.deleteRecursive(stage)
    dst
  }

  private def snap(dir: String): Map[Long, Long] =
    CdcPipeline.readSnapshot(spark, dir).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def boot(dir: String, n: Int): Unit = {
    CdcPipeline.publish(
      spark.range(0, n).select(col("id"), (col("id") * 10L).as("v")),
      dir, Seq("id"), buckets = Some(8))
    ()
  }

  test("fresh files upsert by PK; re-copy is a zero-job no-op; mixed batch ingests only the new file") {
    val dir = tmp(); val land = tmp()
    boot(dir, 100)
    val f1 = writeLanding(land, "f1.parquet", Seq((5L, 555L), (200L, 2000L)))
    val f2 = writeLanding(land, "f2.parquet", Seq((201L, 2010L)))
    val r1 = CopyInto.copyInto(spark, dir, Seq("id"), Seq(f1, f2))
    assert(r1.filesIngested === 2L && r1.filesSkipped === 0L && r1.rowsIngested === 3L)
    val s1 = snap(dir)
    assert(s1(5L) === 555L, "matched PK must update")
    assert(s1(200L) === 2000L && s1(201L) === 2010L, "new PKs must insert")
    assert(s1.size === 102)

    // identical re-copy: skipped entirely, pointer unmoved, zero jobs
    val vBefore = CdcPipeline.currentVersion(dir).get
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val r2 = CopyInto.copyInto(spark, dir, Seq("id"), Seq(f1, f2))
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length === jobs,
      "all-ingested copy must run zero Spark jobs")
    assert(r2 === CopyInto.Result(vBefore, 0L, 2L, 0L))
    assert(CdcPipeline.currentVersion(dir).get === vBefore)

    // mixed batch: one old + one new
    val f3 = writeLanding(land, "f3.parquet", Seq((202L, 2020L)))
    val r3 = CopyInto.copyInto(spark, dir, Seq("id"), Seq(f2, f3))
    assert(r3.filesIngested === 1L && r3.filesSkipped === 1L && r3.rowsIngested === 1L)
    assert(snap(dir).size === 103)
  }

  test("directory form ingests the landing dir incrementally and skips control files") {
    val dir = tmp(); val land = tmp()
    boot(dir, 10)
    writeLanding(land, "a.parquet", Seq((100L, 1L)))
    writeLanding(land, "b.parquet", Seq((101L, 2L)))
    StoreFs.writeString(s"$land/_SUCCESS", "")
    val r1 = CopyInto.copyIntoDir(spark, dir, Seq("id"), land)
    assert(r1.filesIngested === 2L && r1.rowsIngested === 2L)
    // a later landing: only the new file loads
    writeLanding(land, "c.parquet", Seq((102L, 3L)))
    val r2 = CopyInto.copyIntoDir(spark, dir, Seq("id"), land)
    assert(r2.filesIngested === 1L && r2.filesSkipped === 2L)
    assert(snap(dir).size === 13)
  }

  test("a re-landed file with different content (size) re-ingests; same-size identity is the declared boundary") {
    val dir = tmp(); val land = tmp()
    boot(dir, 10)
    val f = writeLanding(land, "reland.parquet", Seq((50L, 1L)))
    assert(CopyInto.copyInto(spark, dir, Seq("id"), Seq(f)).filesIngested === 1L)
    // rewrite the same path with more rows (different size)
    writeLanding(land, "reland.parquet", Seq((50L, 9L), (51L, 9L), (52L, 9L)))
    val r = CopyInto.copyInto(spark, dir, Seq("id"), Seq(f))
    assert(r.filesIngested === 1L, "changed size must re-ingest")
    assert(snap(dir)(50L) === 9L && snap(dir).contains(52L))
  }

  test("crash between publish and markers: re-run advances a version but the state is unchanged") {
    val dir = tmp(); val land = tmp()
    boot(dir, 20)
    val f = writeLanding(land, "once.parquet", Seq((3L, 77L), (300L, 78L)))
    CopyInto.copyInto(spark, dir, Seq("id"), Seq(f))
    val after = snap(dir)
    // simulate the crash window: markers lost, publish survived
    StoreFs.listFilePaths(s"$dir/_ingested", ".mark").foreach(StoreFs.deleteFile)
    val v1 = CdcPipeline.currentVersion(dir).get
    val r = CopyInto.copyInto(spark, dir, Seq("id"), Seq(f))
    assert(r.filesIngested === 1L, "ledger lost → file re-runs")
    assert(CdcPipeline.currentVersion(dir).get === v1 + 1)
    assert(snap(dir) === after, "re-merge of immutable files is state-idempotent")
    // and the healed ledger skips thereafter
    assert(CopyInto.copyInto(spark, dir, Seq("id"), Seq(f)).filesSkipped === 1L)
  }

  test("in-batch duplicate PKs and schema drift refuse with the store untouched") {
    val dir = tmp(); val land = tmp()
    boot(dir, 10)
    val v0 = CdcPipeline.currentVersion(dir).get
    val dup = writeLanding(land, "dup.parquet", Seq((7L, 1L), (7L, 2L)))
    intercept[Exception] {
      CopyInto.copyInto(spark, dir, Seq("id"), Seq(dup))
    }
    assert(CdcPipeline.currentVersion(dir).get === v0)
    assert(snap(dir)(7L) === 70L)

    val stage = Files.createTempDirectory("graft-stage").toString
    Seq((1L, 2L, 3L)).toDF("id", "v", "extra").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val bad = StoreFs.listFilePaths(stage, ".parquet").head
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, dir, Seq("id"), Seq(bad))
    }
    assert(e.getMessage.contains("extra"))
    assert(CdcPipeline.currentVersion(dir).get === v0)

    // missing store refuses
    intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, tmp(), Seq("id"), Seq(dup))
    }
  }

  test("CHECK constraints gate the ingested batch (A71 induction)") {
    val dir = tmp(); val land = tmp()
    boot(dir, 10)
    CdcPipeline.addCheckConstraint(spark, dir, "v_small", "v < 1000")
    val v0 = CdcPipeline.currentVersion(dir).get
    val bad = writeLanding(land, "bad.parquet", Seq((100L, 5000L)))
    intercept[CdcPipeline.ConstraintViolationException] {
      CopyInto.copyInto(spark, dir, Seq("id"), Seq(bad))
    }
    assert(CdcPipeline.currentVersion(dir).get === v0)
    val ok = writeLanding(land, "ok.parquet", Seq((100L, 500L)))
    assert(CopyInto.copyInto(spark, dir, Seq("id"), Seq(ok)).filesIngested === 1L)
  }
}
