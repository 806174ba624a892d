package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.LocalSpark
import java.nio.file.Files

/** A second Hadoop filesystem scheme for the store specs: `raw://`
  * backed by RawLocalFileSystem — NO checksum wrapper, so none of the
  * `.crc` sibling behavior the default `file://` (ChecksumFileSystem)
  * provides, and a distinct scheme so every path must resolve its
  * FileSystem through the Hadoop API. Any residual `java.io.File` or
  * checksum-FS assumption in the control plane fails here.
  */
class RawGraftFs extends RawLocalFileSystem {
  override def getScheme: String = "raw"
  override def getUri: java.net.URI = java.net.URI.create("raw:///")
}

/** The FileContext (AbstractFileSystem) side of the `raw://` scheme —
  * StoreFs.atomicReplace goes through FileContext.rename(OVERWRITE).
  */
class RawGraftAbstractFs(uri: java.net.URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new RawGraftFs, conf, "raw", false)

/** VERDICT r6 #5: the full store surface — merge runs, bucketed
  * publish, SCD2 history + compaction, rollups, job log, vacuum,
  * change-feed cursors — exercised through a NON-default FS scheme
  * and asserted identical to the `file://` run. Proves the control
  * plane has no local-FS assumptions beyond the documented s3a
  * rename caveat (StoreFs.scala).
  */
class StoreFsSchemeSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import TypedProjection.{FieldSpec, Cast}

  private def tmp(): String = Files.createTempDirectory("graft").toString

  private def enableRaw(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.raw.impl", classOf[RawGraftFs].getName)
    hc.set("fs.AbstractFileSystem.raw.impl", classOf[RawGraftAbstractFs].getName)
  }

  private def cfg(target: String) = CdcTableConfig(
    cdcTable = "events_cdc", sourcePath = "events", targetDb = "graft",
    targetTable = "t", targetPath = target,
    pk = Seq("user_id"),
    fieldSpecs = Seq(FieldSpec("k", Cast(LongType))),
    passthrough = Seq("event_id", "value"),
    numBuckets = Some(8),
    rollups = Seq(RollupSpec("by_k", Seq("k"), Seq("event_id"), numBuckets = Some(2))),
    scd2 = Some(Scd2Spec()),
    autoVacuumKeep = Some(2),
    statsCols = Seq("event_id"))

  private def env(rows: Seq[(Long, String, Long, Long, Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", CdcEnvelope.OpCol, CdcEnvelope.TsCol, CdcEnvelope.PosCol,
      CdcEnvelope.LoadTsCol, CdcEnvelope.DataCol, "event_id", "value")
  }

  private val win1 = (1L to 6L).map(u => (u, "u", 100L, u, 100L, s"""{"k":${u % 3}}""", u, 1.0))
  private val win2 = Seq(
    (1L, "u", 200L, 10L, 1500L, """{"k":2}""", 10L, 1.1),
    (2L, "d", 200L, 11L, 1500L, """{"k":2}""", 11L, 0.0),
    (7L, "u", 200L, 12L, 1500L, """{"k":1}""", 12L, 7.0))
  private val win3 = Seq(
    (3L, "u", 300L, 20L, 2500L, """{"k":0}""", 20L, 3.3),
    (8L, "u", 300L, 21L, 2500L, """{"k":2}""", 21L, 8.0))

  /** The whole store surface against `base`, returning every
    * observable it produces (row sets, counts, feed spans) so two
    * schemes can be compared wholesale.
    */
  private def exercise(base: String): Seq[Any] = {
    import spark.implicits._
    val target = s"$base/tgt"; val log = s"$base/log"
    val c = cfg(target)
    val r1 = CdcPipeline.run(spark, c, env(win1), log, 1000L)
    val r2 = CdcPipeline.run(spark, c, env(win2), log, 2000L)
    assert(r1.status === "SUCCESS" && r2.status === "SUCCESS")
    // change-feed cursor committed on this scheme's store
    var feed = Set.empty[Seq[Any]]
    ChangeFeeds.consumeScd2Closed(spark, c, "c1") { df =>
      feed = df.select("user_id", "k", "valid_from_us", "valid_to_us")
        .collect().map(_.toSeq).toSet
    }
    val r3 = CdcPipeline.run(spark, c, env(win3), log, 3000L)
    assert(r3.status === "SUCCESS")
    // layout maintenance through the scheme: closed-dir compaction
    // (write + _GEN pointer swap) and the auto-vacuum already ran
    assert(Scd2Store.compactClosed(spark, c) > 0)
    val snap = CdcPipeline.readSnapshot(spark, target).get
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val hist = Scd2Store.readHistory(spark, c).get
      .select("user_id", "k", "event_id", "value", "valid_from_us", "valid_to_us")
      .collect().map(_.toSeq).toSet
    val keyLookup = Scd2Store.readKeys(spark, c, Seq(1L).toDF("user_id")).get
      .select("user_id", "k", "valid_from_us", "valid_to_us")
      .collect().map(_.toSeq).toSet
    val rollup = CdcPipeline.readRollup(spark, c, "by_k").get
      .select("k", "n_rows", "sum_event_id")
      .orderBy("k").collect().map(_.toSeq).toSeq
    val successes = JobLog.read(spark, log).get
      .filter(col("run_status") === "SUCCESS").count()
    val wm = JobLog.lastWatermark(spark, log, c)
    // r7 surface on this scheme: manifest stats + pruned range read,
    // time-pruned history (RANGE sidecars through StoreFs), and the
    // zero-copy clone (pin file + absolute cross-dir references)
    val ranged = CdcPipeline.readRange(spark, target, "event_id", Some(10L), None).get
      .select("user_id", "event_id").collect().map(_.toSeq).toSet
    val histRanged = Scd2Store.readHistoryRange(spark, c, 1500L).get
      .select("user_id", "k", "valid_from_us", "valid_to_us")
      .collect().map(_.toSeq).toSet
    val cloneDir = s"$base/clone"
    CdcPipeline.cloneSnapshot(target, cloneDir)
    val cloneRows = CdcPipeline.readSnapshot(spark, cloneDir).get
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    Seq(snap, hist, keyLookup, rollup, feed, successes, wm,
      CdcPipeline.currentVersion(target).get, ranged, histRanged, cloneRows)
  }

  test("store/SCD2/rollup/job-log end-to-end: raw:// (no-checksum FS) equals file://") {
    enableRaw()
    val viaFile = exercise(tmp())
    val viaRaw = exercise("raw://" + tmp())
    assert(viaRaw === viaFile,
      "every store observable must be identical across FS schemes")
    // sanity: the raw scheme really was exercised (files exist under
    // the plain local path, but no .crc siblings — RawLocalFileSystem
    // writes none, unlike the default ChecksumFileSystem)
    val probe = tmp()
    StoreFs.writeString(s"raw://$probe/x", "1")
    assert(new java.io.File(s"$probe/x").exists, "raw:// lands on the local disk")
    assert(!new java.io.File(s"$probe/.x.crc").exists, "raw:// writes no checksum siblings")
    StoreFs.writeString(s"$probe/y", "1")
    assert(new java.io.File(s"$probe/.y.crc").exists,
      "file:// (checksum FS) does write them — the two schemes differ for real")
  }

  test("orphaned crc sidecar: read exhaustion retires it instead of failing forever") {
    // a writer crash between atomicReplace's sidecar move and data
    // move leaves a crc permanently paired with the wrong data — the
    // mismatch never self-heals, so retry exhaustion must retire the
    // orphan and read raw instead of failing every later read until
    // the next successful swap (r13 ADVICE)
    val dir = Files.createTempDirectory("graft").toString
    val path = s"$dir/ptr"
    StoreFs.writeString(path, "old-pointer-value")
    // simulate the crash: swap the DATA bytes raw (same length, so the
    // stale crc is a pure checksum mismatch), leaving the crc behind
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "new-pointer-value".getBytes("UTF-8"))
    assert(new java.io.File(s"$dir/.ptr.crc").exists, "fixture: stale crc present")
    assert(StoreFs.readString(path) === "new-pointer-value",
      "exhausted read must recover the raw bytes")
    assert(!new java.io.File(s"$dir/.ptr.crc").exists,
      "the orphaned sidecar is retired")
    // and the file is cleanly readable from then on
    assert(StoreFs.readString(path) === "new-pointer-value")
    StoreFs.deleteRecursive(dir)
    ()
  }

  test("createExclusive is atomic under thread races: exactly one winner per path") {
    // Hadoop's local ChecksumFileSystem implements create(overwrite =
    // false) as exists-then-create — a TOCTOU hole that let two
    // writers both claim a version (caught by the N-writer race
    // test); the nio CREATE_NEW path must admit exactly one winner.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = java.nio.file.Files.createTempDirectory("graft").toString
    val pool = Executors.newFixedThreadPool(16)
    try {
      (0 until 50).foreach { round =>
        val path = s"$dir/claim-$round"
        val start = new CountDownLatch(1)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val done = new CountDownLatch(16)
        (0 until 16).foreach { t =>
          pool.execute { () =>
            start.await()
            if (StoreFs.createExclusive(path, s"t$t")) { wins.incrementAndGet(); () }
            done.countDown()
          }
        }
        start.countDown()
        assert(done.await(30, TimeUnit.SECONDS))
        assert(wins.get() === 1, s"round $round: ${wins.get()} winners")
      }
    } finally { pool.shutdownNow(); StoreFs.deleteRecursive(dir) }
  }
}
