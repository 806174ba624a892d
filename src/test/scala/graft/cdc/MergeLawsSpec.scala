package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** Property-style laws of the merge algebra over randomized event
  * histories (seeded generator — reproducible):
  *
  *  1. incremental composition — merging any window split equals the
  *     one-shot snapshot (the invariant CdcPipeline relies on), and
  *     both equal an independent in-memory model;
  *  2. idempotence — re-applying the same compacted change set is a
  *     no-op;
  *  3. the one-pass route equals the reference's two-view
  *     (log_v_i/log_v_d) resolution.
  */
case class MergeLawEv(pk: Int, op: String, ts: Long, pos: Long)

class MergeLawsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private type Ev = MergeLawEv
  private def Ev(pk: Int, op: String, ts: Long, pos: Long): Ev = MergeLawEv(pk, op, ts, pos)

  private def genHistory(rnd: scala.util.Random): List[Ev] = {
    val n = rnd.nextInt(60)
    List.tabulate(n) { i =>
      Ev(rnd.nextInt(8), if (rnd.nextInt(4) == 0) "d" else "u", 1L + rnd.nextInt(40), i.toLong)
    }
  }

  private def toEnv(evs: Seq[Ev]) =
    evs.toDF("pk", CdcEnvelope.OpCol, CdcEnvelope.TsCol, CdcEnvelope.PosCol)
      .withColumn(CdcEnvelope.LoadTsCol, col(CdcEnvelope.TsCol))
      .withColumn(CdcEnvelope.DataCol, lit("{}"))

  private val targetCols = Seq("pk", CdcEnvelope.TsCol, CdcEnvelope.PosCol)

  /** Independent in-memory model of the reference semantics. */
  private def snapshotOf(evs: Seq[Ev]): Set[(Int, Long, Long)] =
    evs.groupBy(_.pk).flatMap { case (pk, es) =>
      val last = es.maxBy(e => (e.ts, e.op == "u", e.pos))
      if (last.op == "u") Some((pk, last.ts, last.pos)) else None
    }.toSet

  private def collect(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] =
    df.select(targetCols.map(col): _*).as[(Int, Long, Long)].collect().toSet

  test("incremental merge over any split equals one-shot and the model") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val evs = genHistory(rnd)
      val split = 1L + rnd.nextInt(40)
      val env = toEnv(evs)
      val oneShot = SnapshotMerge.fromHistory(env, Seq("pk"), targetCols)
      val before = env.filter(col(CdcEnvelope.LoadTsCol) <= split)
      val after = env.filter(col(CdcEnvelope.LoadTsCol) > split)
      val target = SnapshotMerge.fromHistory(before, Seq("pk"), targetCols)
      val merged =
        if (evs.exists(_.ts > split))
          SnapshotMerge.merge(target, ChangeCompaction.compactForMerge(after, Seq("pk")), Seq("pk"))
        else target
      val model = snapshotOf(evs)
      assert(collect(oneShot) === model, s"one-shot mismatch: evs=$evs")
      assert(collect(merged) === model, s"split=$split mismatch: evs=$evs")
    }
  }

  test("merging the same change set twice is idempotent") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val evs = genHistory(rnd)
      if (evs.nonEmpty) {
        val env = toEnv(evs)
        val changes = ChangeCompaction.compactForMerge(env, Seq("pk"))
        val once = SnapshotMerge.merge(
          SnapshotMerge.fromHistory(env, Seq("pk"), targetCols), changes, Seq("pk"))
        val twice = SnapshotMerge.merge(once, changes, Seq("pk"))
        assert(collect(once) === collect(twice), s"not idempotent: evs=$evs")
      }
    }
  }

  test("bucketed incremental publish over random window splits equals the model, vacuum interleaved") {
    // End-to-end law for the r3 publish layer: running the pipeline
    // over ANY window split of a random history — through the real
    // bucketed target on disk, with vacuum fired at random points —
    // must land exactly the model snapshot. Covers window filtering,
    // compaction, touched-bucket subset merge, manifest carry-over,
    // and GC safety in one property.
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val evs = genHistory(rnd)
      val env = toEnv(evs).withColumn("v", col(CdcEnvelope.PosCol))
      val target = java.nio.file.Files.createTempDirectory("graft-law-tgt").toString
      val log = java.nio.file.Files.createTempDirectory("graft-law-log").toString
      val cfg = CdcTableConfig("law_cdc", "mem", "graft", "law", target,
        pk = Seq("pk"), fieldSpecs = Nil, passthrough = Seq("v"),
        numBuckets = Some(16))
      val cuts = (Seq.fill(rnd.nextInt(3))(1L + rnd.nextInt(40).toLong) :+ 41L)
        .distinct.sorted
      cuts.foreach { end =>
        CdcPipeline.run(spark, cfg, env, log, end)
        if (rnd.nextBoolean()) CdcPipeline.vacuum(target, keepVersions = 1)
      }
      val got = CdcPipeline.readSnapshot(spark, target).get
        .select("pk", "v").as[(Int, Long)].collect().toSet
      val model = snapshotOf(evs).map { case (pk, _, pos) => (pk, pos) }
      assert(got === model, s"trial=$trial cuts=$cuts evs=$evs")
    }
  }

  test("one-pass routing equals the two-view upsert/delete resolution") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 15) {
      val evs = genHistory(rnd)
      val env = toEnv(evs)
      val (ups1, dels1) = ChangeCompaction.routed(env, Seq("pk"))
      val upsKeys1 = ups1.select("pk").as[Int].collect().toSet
      val delKeys1 = dels1.select("pk").as[Int].collect().toSet
      val upsKeys2 = ChangeCompaction.upsertSet(env, Seq("pk")).select("pk").as[Int].collect().toSet
      val delKeys2 = ChangeCompaction.deleteSet(env, Seq("pk")).select("pk").as[Int].collect().toSet
      // keys whose newest change is a delete agree exactly; the
      // two-view upsert set additionally holds keys whose newest
      // change is a delete but that saw some older upsert — those are
      // exactly the keys the delete view then removes (merge order in
      // the reference: upsert MERGE first, delete MERGE second).
      assert(delKeys1 === delKeys2, s"delete sets differ: evs=$evs")
      assert(upsKeys1.subsetOf(upsKeys2))
      assert((upsKeys2 -- upsKeys1) === (upsKeys2 intersect delKeys2), s"evs=$evs")
    }
  }
}
