package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType
import graft.LocalSpark
import java.nio.file.Files

/** Durable change-feed consumption (VERDICT r6 #4): the cursor API
  * delivers every span exactly once across kill+resume (process-
  * then-commit), never re-reads committed dirs/buckets, and the
  * readStream path over the append-only closed dirs delivers
  * incrementally across restarts from one checkpoint.
  */
class ChangeFeedsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import TypedProjection.{FieldSpec, Cast}

  private def tmp(): String = Files.createTempDirectory("graft").toString

  private def cfg(target: String) = CdcTableConfig(
    cdcTable = "events_cdc", sourcePath = "events", targetDb = "graft",
    targetTable = "t", targetPath = target,
    pk = Seq("user_id"),
    fieldSpecs = Seq(FieldSpec("k", Cast(LongType))),
    passthrough = Seq("event_id", "value"),
    numBuckets = Some(8))

  private def env(rows: Seq[(Long, String, Long, Long, Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", CdcEnvelope.OpCol, CdcEnvelope.TsCol, CdcEnvelope.PosCol,
      CdcEnvelope.LoadTsCol, CdcEnvelope.DataCol, "event_id", "value")
  }

  // three windows (watermarks 1000/2000/3000 cut on load_ts):
  // w1 inserts 1-4; w2 updates 1,2 (closes 2 slices); w3 updates 1
  // and deletes 3 (closes 2 more)
  private val win1 = (1L to 4L).map(u => (u, "u", 100L, u, 100L, s"""{"k":${u * 10}}""", u, 1.0))
  private val win2 = Seq(
    (1L, "u", 200L, 10L, 1500L, """{"k":11}""", 10L, 1.1),
    (2L, "u", 200L, 11L, 1500L, """{"k":21}""", 11L, 2.1))
  private val win3 = Seq(
    (1L, "u", 300L, 20L, 2500L, """{"k":12}""", 20L, 1.2),
    (3L, "d", 300L, 21L, 2500L, """{"k":30}""", 21L, 0.0))

  private def slices(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select("user_id", "k", "event_id", "value", "valid_from_us", "valid_to_us")
      .collect().map(_.toSeq).toSet

  test("SCD2 closed-slice cursor: every slice once across kill+resume, no re-reads after commit") {
    val target = tmp(); val log = tmp()
    val c = cfg(target).copy(scd2 = Some(Scd2Spec()))
    CdcPipeline.run(spark, c, env(win1), log, 1000L)
    CdcPipeline.run(spark, c, env(win2), log, 2000L)

    var delivered = Set.empty[Seq[Any]]
    val r1 = ChangeFeeds.consumeScd2Closed(spark, c, "c1") { df => delivered = slices(df) }
    assert(r1 === CdcPipeline.currentVersion(Scd2Store.openPath(c)))
    assert(delivered === slices(Scd2Store.closedSince(spark, c, -1L).get),
      "first consumption delivers the full closed history")
    assert(delivered.nonEmpty)
    // current: the handler must NOT be called again
    assert(ChangeFeeds.consumeScd2Closed(spark, c, "c1") { _ =>
      fail("handler called with no new span") } === None)

    // new advancement; the first delivery attempt CRASHES inside f —
    // the position must not move, and the retry re-delivers the span
    CdcPipeline.run(spark, c, env(win3), log, 3000L)
    val posBefore = ChangeFeeds.position(Scd2Store.path(c), "c1")
    intercept[RuntimeException] {
      ChangeFeeds.consumeScd2Closed(spark, c, "c1") { _ =>
        throw new RuntimeException("consumer died mid-span")
      }
    }
    assert(ChangeFeeds.position(Scd2Store.path(c), "c1") === posBefore,
      "a crash inside the handler must not advance the cursor")
    var files = Array.empty[String]
    var span = Set.empty[Seq[Any]]
    ChangeFeeds.consumeScd2Closed(spark, c, "c1") { df =>
      files = df.inputFiles; span = slices(df)
    }
    // exactly the slices win3 closed, and ONLY the new dir is read
    assert(span === slices(Scd2Store.closedSince(spark, c, posBefore.get).get))
    assert(span.nonEmpty)
    assert(files.nonEmpty && files.forall(_.contains("/closed/d")),
      s"feed must read closed dirs only, got ${files.take(3).mkString(",")}")
    val reRead = files.filterNot(_.contains(s"/closed/d${r1.get + 1}/"))
    assert(reRead.isEmpty,
      s"committed dirs must never be re-read, got ${reRead.take(3).mkString(",")}")
    assert(ChangeFeeds.consumeScd2Closed(spark, c, "c1") { _ =>
      fail("handler called after resume with no new span") } === None)
  }

  test("snapshot-diff and rollup-diff cursors: baseline at registration, then per-span i/u/d delivery") {
    val target = tmp(); val log = tmp()
    val c = cfg(target).copy(
      rollups = Seq(RollupSpec("by_k", Seq("k"), Seq("event_id"), numBuckets = Some(2))))
    CdcPipeline.run(spark, c, env(win1), log, 1000L)
    // first call baselines: commits the current version, delivers nothing
    assert(ChangeFeeds.consumeSnapshotDiff(spark, c, "s1") { _ =>
      fail("baseline must not deliver") } === None)
    assert(ChangeFeeds.consumeRollupDiff(spark, c, "by_k", "r1") { _ =>
      fail("baseline must not deliver") } === None)

    val v0 = CdcPipeline.currentVersion(target).get
    CdcPipeline.run(spark, c, env(win2), log, 2000L)
    val v1 = CdcPipeline.currentVersion(target).get
    var diff = Set.empty[Seq[Any]]
    assert(ChangeFeeds.consumeSnapshotDiff(spark, c, "s1") { df =>
      diff = df.collect().map(_.toSeq).toSet }.contains(v1))
    assert(diff === CdcPipeline.snapshotDiff(spark, target, v0, v1, Seq("user_id")).get
      .collect().map(_.toSeq).toSet)
    assert(diff.nonEmpty)
    assert(ChangeFeeds.consumeSnapshotDiff(spark, c, "s1") { _ =>
      fail("already current") } === None)

    var rdiff = Set.empty[Seq[Any]]
    assert(ChangeFeeds.consumeRollupDiff(spark, c, "by_k", "r1") { df =>
      rdiff = df.collect().map(_.toSeq).toSet }.nonEmpty)
    assert(rdiff.nonEmpty, "win2's k changes must move groups")
    assert(rdiff.forall(_.last != null), "every rollup diff row is op-tagged")
  }

  test("readChangeFeed: per-commit union equals the per-step diffs; vacuumed range → None") {
    val target = tmp(); val log = tmp()
    val c = cfg(target)
    CdcPipeline.run(spark, c, env(win1), log, 1000L) // v0
    CdcPipeline.run(spark, c, env(win2), log, 2000L) // v1
    CdcPipeline.run(spark, c, env(win3), log, 3000L) // v2
    val feed = CdcPipeline.readChangeFeed(spark, target, Seq("user_id"), 0L, 2L).get
    val expect = (0L until 2L).flatMap { v =>
      CdcPipeline.snapshotDiff(spark, target, v, v + 1, Seq("user_id")).get
        .collect().map(_.toSeq :+ (v + 1))
    }.toSet
    assert(feed.collect().map(_.toSeq).toSet === expect)
    // w2 commits 2 updates; w3 one update + one delete, all stamped
    assert(feed.filter(col("_commit_version") === 1L).count() === 2)
    assert(feed.filter(col("_commit_version") === 2L &&
      col(CdcEnvelope.OpCol) === "d").count() === 1)
    // empty range: zero rows, schema intact
    val empty = CdcPipeline.readChangeFeed(spark, target, Seq("user_id"), 1L, 1L).get
    assert(empty.count() === 0 && empty.columns.contains("_commit_version"))
    // delta publishes carry buckets by reference, so vacuum keeps old
    // version dirs (and their manifests) alive — the feed stays
    // readable. A full local rewrite (optimize) + vacuum to 1 version
    // genuinely retires v0..v2: the feed then refuses the whole
    // range rather than serving a partial one.
    CdcPipeline.optimize(spark, target, Seq("user_id"), Seq("k")) // v3, all local
    CdcPipeline.vacuum(target, keepVersions = 1)
    assert(CdcPipeline.manifest(target, 0).isEmpty, "v0 must be gone")
    assert(CdcPipeline.readChangeFeed(spark, target, Seq("user_id"), 0L, 3L).isEmpty)
  }

  test("snapshot-diff cursor: a vacuumed base version fails loudly, never silently skips spans") {
    val target = tmp(); val log = tmp()
    // one bucket: every publish rewrites it, so no version survives by
    // carried-bucket reference and the vacuum really reclaims the base
    // (at 8 buckets the reference counting keeps old manifests alive
    // as long as any bucket is still carried — the cursor then keeps
    // working, which the tail of this test covers anyway)
    val c = cfg(target).copy(numBuckets = Some(1))
    CdcPipeline.run(spark, c, env(win1), log, 1000L)
    assert(ChangeFeeds.consumeSnapshotDiff(spark, c, "lagger") { _ => () } === None) // baseline at v0
    // the consumer lags while many versions publish and vacuum reclaims its base
    CdcPipeline.run(spark, c, env(win2), log, 2000L)
    CdcPipeline.run(spark, c, env(win3), log, 3000L)
    CdcPipeline.run(spark, c, env(Seq(
      (9L, "u", 400L, 30L, 3500L, """{"k":90}""", 30L, 9.0))), log, 4000L)
    CdcPipeline.vacuum(target, keepVersions = 2)
    val e = intercept[IllegalStateException] {
      ChangeFeeds.consumeSnapshotDiff(spark, c, "lagger") { _ => () }
    }
    assert(e.getMessage.contains("vacuumed") || e.getMessage.contains("gone"),
      s"the failure must name the cause, got: ${e.getMessage}")
    // a consumer that polls within the keep window keeps working
    assert(ChangeFeeds.consumeSnapshotDiff(spark, c, "fresh") { _ => () } === None)
    CdcPipeline.run(spark, c, env(Seq(
      (10L, "u", 500L, 31L, 4500L, """{"k":100}""", 31L, 10.0))), log, 5000L)
    var n = -1L
    ChangeFeeds.consumeSnapshotDiff(spark, c, "fresh") { df => n = df.count() }
    assert(n === 1L, "one inserted PK between the fresh consumer's spans")
  }

  test("readStream over closed dirs: incremental delivery across restarts from one checkpoint") {
    val target = tmp(); val log = tmp(); val ckpt = tmp()
    val c = cfg(target).copy(scd2 = Some(Scd2Spec()))
    CdcPipeline.run(spark, c, env(win1), log, 1000L)
    CdcPipeline.run(spark, c, env(win2), log, 2000L)

    val seen = scala.collection.mutable.Set.empty[Seq[Any]]
    def drain(): Unit = {
      val q = ChangeFeeds.scd2ClosedStream(spark, c).get
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen ++= slices(batch.toDF())
          ()
        }
        .start()
      q.awaitTermination()
    }
    drain()
    assert(seen.toSet === slices(Scd2Store.closedSince(spark, c, -1L).get),
      "first drain delivers every closed slice")
    val afterFirst = seen.toSet

    // kill + resume: a new advancement lands while the stream is down
    CdcPipeline.run(spark, c, env(win3), log, 3000L)
    seen.clear()
    drain()
    assert(seen.toSet.nonEmpty, "restart must deliver the new slices")
    assert((seen.toSet -- slices(Scd2Store.closedSince(spark, c, -1L).get)) === Set.empty)
    assert((seen.toSet & afterFirst) === Set.empty,
      "already-delivered dirs must not re-deliver from the same checkpoint")
  }

  test("exportChangeFeed: rename-published commit dirs, cursor exactly-once, crash-replay converges") {
    import spark.implicits._
    val (dir, feed) = (tmp(), tmp() + "/feed")
    def snap(n: Int, tag: String) = spark.range(0, n)
      .select(col("id"), lit(tag).as("t"))
    CdcPipeline.publish(snap(100, "a"), dir, Seq("id"), buckets = Some(4))
    // first call = baseline registration, exports nothing
    assert(ChangeFeeds.exportChangeFeed(spark, dir, feed, Seq("id")) === Seq.empty)
    CdcPipeline.deleteWhere(spark, dir, Seq("id"), col("id") < 10)   // v1
    CdcPipeline.updateWhere(spark, dir, Seq("id"),
      col("id") === 50L, Map("t" -> lit("upd")))                     // v2
    assert(ChangeFeeds.exportChangeFeed(spark, dir, feed, Seq("id")) === Seq(1L, 2L))
    // feed content ≡ the pull feed over the same range
    val pulled = CdcPipeline.readChangeFeed(spark, dir, Seq("id"), 0L, 2L).get
      .collect().map(_.toSeq).toSet
    val fed = spark.read.parquet(s"$feed/commit=*").collect().map(_.toSeq).toSet
    assert(fed === pulled)
    // idempotent when current
    assert(ChangeFeeds.exportChangeFeed(spark, dir, feed, Seq("id")) === Seq.empty)
    // crash between dirs and cursor commit: rewind the cursor — the
    // replay SKIPS present dirs (no rewrite = no re-delivery) and ends
    // at the same state
    val filesBefore = StoreFs.listFilePaths(s"$feed/commit=2", ".parquet").toSet
    StoreFs.writeString(s"$dir/_cursors/cdf-export", "0")
    assert(ChangeFeeds.exportChangeFeed(spark, dir, feed, Seq("id")) === Seq(1L, 2L))
    assert(StoreFs.listFilePaths(s"$feed/commit=2", ".parquet").toSet === filesBefore,
      "an already-published commit dir must not be rewritten on replay")
    // streaming drain sees both commits once; a later export adds only its own
    val ckpt = tmp() + "/ckpt"
    def drain(): Set[Seq[Any]] = {
      val got = scala.collection.mutable.Set.empty[Seq[Any]]
      val q = ChangeFeeds.changeFeedStream(spark, feed).get
        .writeStream
        .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            got ++= batch.collect().map(_.toSeq); ()
        }
        .start()
      q.awaitTermination()
      got.toSet
    }
    val d1 = drain()
    assert(d1 === pulled)
    CdcPipeline.deleteWhere(spark, dir, Seq("id"), col("id") === 99L) // v3
    assert(ChangeFeeds.exportChangeFeed(spark, dir, feed, Seq("id")) === Seq(3L))
    // a fresh query on the SAME checkpoint resumes past delivered files
    val d2 = drain()
    assert(d2.size === 1 && !d1.contains(d2.head),
      s"second drain must deliver ONLY commit 3's one change, got $d2")
  }
}
