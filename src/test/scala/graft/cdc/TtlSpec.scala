package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import java.nio.file.Files

/** A79: row-level TTL retention through maintain(). The policy knobs
  * (or `graft.ttl.*` table properties) declare a BIGINT epoch-µs
  * column and a max age; the maintenance pass deletes expired rows
  * via A41's copy-on-write path. Laws: exact survivor set, the
  * manifest-stats trigger is FREE (zero Spark jobs) when nothing
  * expired, stat-less columns degrade to a conservative check that
  * stays correct, and the property-driven path works end to end.
  */
class TtlSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import graft.cdc.{CdcPipeline => P}

  private def tmp(): String = Files.createTempDirectory("graft-ttl").toString

  // rows 0..3999; t = id * 1000 µs, so the cutoff splits cleanly
  private def fixture(n: Int) =
    spark.range(0, n).select(col("id"), (col("id") * 1000L).as("t"),
      (col("id") % 7L).as("v"))

  test("ttl: expired rows deleted exactly; survivors intact; report carries the delete") {
    val dir = tmp()
    P.publish(fixture(4000), dir, Seq("id"), buckets = Some(8),
      statsCols = Seq("t"))
    // cutoff at t < 1,000,000 µs → ids 0..999 expire
    val pol = P.MaintenancePolicy(ttlColumn = Some("t"),
      ttlMaxAgeUs = Some(3000000L), ttlNowUs = Some(4000000L))
    val rep = P.maintain(spark, dir, Seq("id"), pol).get
    assert(rep.ttlDeleted.exists(_._2 === 1000L))
    val snap = P.readSnapshot(spark, dir).get
    assert(snap.count() === 3000L)
    assert(snap.agg(min("t")).head().getLong(0) === 1000000L)
    // second pass at the same clock: stats now start at the cutoff —
    // the trigger proves nothing expired and runs ZERO Spark jobs
    val v = P.currentVersion(dir).get
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val rep2 = P.maintain(spark, dir, Seq("id"),
      pol.copy(smallFilesPerBucket = None, dvFoldPct = None,
        keepVersions = None, bloomRebuildPct = None)).get
    assert(rep2.ttlDeleted === None)
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length === jobs,
      "nothing-expired TTL check must be manifest-only (zero Spark jobs)")
    assert(P.currentVersion(dir).get === v, "idle TTL pass must not publish")
    StoreFs.deleteRecursive(dir)
  }

  test("ttl: stat-less column degrades to a conservative scan that stays correct") {
    val dir = tmp()
    // no statsCols: the trigger cannot prove anything, so it scans
    P.publish(fixture(2000), dir, Seq("id"), buckets = Some(4))
    val pol = P.MaintenancePolicy(ttlColumn = Some("t"),
      ttlMaxAgeUs = Some(1500000L), ttlNowUs = Some(2000000L))
    val rep = P.maintain(spark, dir, Seq("id"), pol).get
    assert(rep.ttlDeleted.exists(_._2 === 500L)) // ids 0..499
    assert(P.readSnapshot(spark, dir).get.count() === 1500L)
    // nothing further expired: the conservative scan finds 0 matches,
    // deletes nothing, publishes nothing
    val v = P.currentVersion(dir).get
    val rep2 = P.maintain(spark, dir, Seq("id"), pol).get
    assert(rep2.ttlDeleted === None)
    assert(P.currentVersion(dir).get === v)
    StoreFs.deleteRecursive(dir)
  }

  test("ttl: property-driven via maintainAuto (graft.ttl.* table properties)") {
    val dir = tmp()
    P.publish(fixture(1000), dir, Seq("id"), buckets = Some(4),
      statsCols = Seq("t"))
    // every t is ancient relative to the wall clock; maxAge 1s → all rows expire
    P.setTableProperties(dir, Map(
      "graft.ttl.column" -> "t", "graft.ttl.maxAgeUs" -> "1000000"))
    val rep = P.maintainAuto(spark, dir, Seq("id")).get
    assert(rep.ttlDeleted.exists(_._2 === 1000L))
    assert(P.readSnapshot(spark, dir).get.count() === 0L)
    StoreFs.deleteRecursive(dir)
  }
}
