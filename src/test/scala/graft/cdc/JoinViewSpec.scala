package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.LocalSpark
import java.nio.file.Files

/** A50 — incrementally maintained join view: randomized multi-step
  * maintenance must equal the one-shot join of the current states,
  * dim-side maintenance must be bucket-pruned through the fk index,
  * and index false positives (left by fk changes) must never affect
  * results.
  */
class JoinViewSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-jv").toString

  // local reference model: fact pk → (fk, payload); dim key → seg
  private def expected(fact: Map[Long, (Long, Long)], dim: Map[Long, String]): Set[(Long, Long, Long, Option[String])] =
    fact.map { case (pk, (fk, pay)) => (pk, fk, pay, dim.get(fk)) }.toSet

  private def viewRows(spec: JoinView.JoinViewSpec): Set[(Long, Long, Long, Option[String])] =
    JoinView.read(spark, spec).get
      .select("pk", "fk", "pay", "seg")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getString(3))))
      .toSet

  private def factDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("pk", "fk", "pay")

  private def dimDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("dk", "seg")

  test("randomized fact/dim deltas converge to the one-shot join at every step") {
    val rnd = new scala.util.Random(42)
    val spec = JoinView.JoinViewSpec(tmp(), Seq("pk"), "fk", "dk", Seq("seg"), numBuckets = 8)

    var fact = (1L to 200L).map(pk => pk -> ((pk % 17) + 1, pk * 10)).toMap
    var dim = (1L to 20L).map(k => k -> s"seg$k").toMap
    JoinView.bootstrap(spark, spec,
      factDf(fact.toSeq.map { case (pk, (fk, p)) => (pk, fk, p) }),
      dimDf(dim.toSeq))
    assert(viewRows(spec) === expected(fact, dim))

    for (step <- 1 to 5) {
      // fact delta: some upserts (possibly changing fk!), some deletes
      val upPks = (1 to 15).map(_ => rnd.nextInt(220).toLong + 1).distinct
      val delPks = (1 to 5).map(_ => rnd.nextInt(200).toLong + 1).distinct
        .filterNot(upPks.contains)
      val ups = upPks.map(pk => (pk, (rnd.nextInt(25).toLong + 1), pk * 10 + step))
      val changes = ups.toDF("pk", "fk", "pay").withColumn("__op", lit("u"))
        .unionByName(delPks.toDF("pk").withColumn("fk", lit(null).cast("long"))
          .withColumn("pay", lit(null).cast("long")).withColumn("__op", lit("d")))
      JoinView.applyFactDelta(spark, spec, changes,
        dimDf(dim.toSeq), Some(changes.count()))
      fact = (fact ++ ups.map(u => u._1 -> ((u._2, u._3)))) -- delPks
      assert(viewRows(spec) === expected(fact, dim), s"after fact delta $step")

      // dim delta: an update and a delete
      val dUp = rnd.nextInt(25).toLong + 1
      val dDel = rnd.nextInt(25).toLong + 1
      val dimChanges = Seq((dUp, s"new${step}", "u")).toDF("dk", "seg", "__op")
        .unionByName(
          if (dDel != dUp) Seq((dDel, null.asInstanceOf[String], "d")).toDF("dk", "seg", "__op")
          else Seq.empty[(Long, String, String)].toDF("dk", "seg", "__op"))
      JoinView.applyDimDelta(spark, spec, dimChanges)
      dim = (dim + (dUp -> s"new${step}")) -- (if (dDel != dUp) Seq(dDel) else Nil)
      assert(viewRows(spec) === expected(fact, dim), s"after dim delta $step")
    }
  }

  test("dim delta is bucket-pruned via the fk index; unreferenced keys are a no-op") {
    val spec = JoinView.JoinViewSpec(tmp(), Seq("pk"), "fk", "dk", Seq("seg"), numBuckets = 16)
    // fk = pk for the first 50 rows (one referer each), 0 for the rest
    // — so a single-key dim change touches exactly one fact bucket
    val fact = (1L to 400L).map(pk => (pk, if (pk <= 50) pk else 0L, pk))
    val dim = (0L to 50L).map(k => (k, s"s$k"))
    JoinView.bootstrap(spark, spec, factDf(fact), dimDf(dim))
    val verBefore = CdcPipeline.currentVersion(spec.viewDir).get
    // a dim key nothing references: version must not advance
    JoinView.applyDimDelta(spark, spec, Seq((99L, "x", "u")).toDF("dk", "seg", "__op"))
    assert(CdcPipeline.currentVersion(spec.viewDir).get === verBefore,
      "unreferenced dim key must be a no-op")
    // referenced key with ONE referer: result correct, read pruned
    JoinView.applyDimDelta(spark, spec, Seq((7L, "UPD", "u")).toDF("dk", "seg", "__op"))
    val v = JoinView.read(spark, spec).get
    assert(v.filter(col("fk") === 7L && col("seg") =!= "UPD").count() === 0L)
    assert(v.filter(col("fk") === 8L && col("seg") =!= "s8").count() === 0L)
    // the dim-merge version rewrote fewer buckets than the store holds
    val hist = CdcPipeline.describeHistory(spark, spec.viewDir).get
      .filter(col("op") === "join-view-dim")
      .select("rewritten_buckets", "num_buckets").head()
    assert(hist.getInt(0) < 16, s"dim merge must not rewrite every bucket: $hist")
  }

  test("rollup over the maintained join view advances by view diffs (IVM composition)") {
    // The A23 single-table IVM composes with A50: the view's
    // snapshotDiff between maintained versions IS a CDC change set,
    // so an aggregate grouped by a DIM attribute (sum of fact payload
    // per segment — the star-schema rollup) advances incrementally
    // through fact AND dim deltas, never rescanning the view.
    val spec = JoinView.JoinViewSpec(tmp(), Seq("pk"), "fk", "dk", Seq("seg"), numBuckets = 8)
    val fact0 = (1L to 100L).map(pk => (pk, (pk % 5) + 1, pk))
    val dim0 = (1L to 6L).map(k => (k, s"seg${k % 3}"))
    JoinView.bootstrap(spark, spec, factDf(fact0), dimDf(dim0))
    def viewAt(v: Long) = CdcPipeline.readSnapshotAt(spark, spec.viewDir, v).get
    var state = IncrementalAgg.fromSnapshot(viewAt(0L), Seq("seg"), "pay")
      .localCheckpoint(true)
    def advance(vPrev: Long, vNew: Long): Unit = {
      val diff = CdcPipeline.snapshotDiff(spark, spec.viewDir, vPrev, vNew, Seq("pk")).get
      state = IncrementalAgg.applyDelta(state, viewAt(vPrev), diff,
        Seq("pk"), Seq("seg"), "pay").localCheckpoint(true)
    }
    // fact delta: moves + deletes
    JoinView.applyFactDelta(spark, spec,
      Seq((7L, 2L, 700L), (101L, 3L, 1010L)).toDF("pk", "fk", "pay")
        .withColumn("__op", lit("u"))
        .unionByName(Seq(9L).toDF("pk").withColumn("fk", lit(null).cast("long"))
          .withColumn("pay", lit(null).cast("long")).withColumn("__op", lit("d"))),
      dimDf(dim0), Some(3L))
    advance(0L, 1L)
    // dim delta: seg flip moves whole groups
    JoinView.applyDimDelta(spark, spec, Seq((2L, "segX", "u")).toDF("dk", "seg", "__op"))
    advance(1L, 2L)
    val got = state.select("seg", "sum_pay").collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    val want = IncrementalAgg.fromSnapshot(
        JoinView.read(spark, spec).get, Seq("seg"), "pay")
      .select("seg", "sum_pay").collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(got === want, s"maintained rollup diverged: $got vs $want")
  }

  test("index false positives after an fk change stay conservative; rebuildIndex restores exactness") {
    val spec = JoinView.JoinViewSpec(tmp(), Seq("pk"), "fk", "dk", Seq("seg"), numBuckets = 8)
    JoinView.bootstrap(spark, spec, factDf(Seq((1L, 5L, 10L), (2L, 6L, 20L))),
      dimDf(Seq((5L, "a"), (6L, "b"))))
    // pk 1 moves fk 5 → 6: the (5, bucket-of-1) index pair is now stale
    JoinView.applyFactDelta(spark, spec,
      Seq((1L, 6L, 11L)).toDF("pk", "fk", "pay").withColumn("__op", lit("u")),
      dimDf(Seq((5L, "a"), (6L, "b"))), Some(1L))
    // a dim update to the ABANDONED key must not resurrect it anywhere
    JoinView.applyDimDelta(spark, spec, Seq((5L, "A2", "u")).toDF("dk", "seg", "__op"))
    assert(viewRows(spec) === Set((1L, 6L, 11L, Some("b")), (2L, 6L, 20L, Some("b"))))
    // stale pair exists before rebuild, gone after
    def indexPairs: Set[(Long, Int)] =
      CdcPipeline.readSnapshot(spark, s"${spec.viewDir}/_fkindex").get
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(indexPairs.exists(_._1 == 5L), "stale pair is expected pre-rebuild")
    JoinView.rebuildIndex(spark, spec)
    assert(!indexPairs.exists(_._1 == 5L), "rebuild must drop abandoned fks")
    // and maintenance still works on the rebuilt index
    JoinView.applyDimDelta(spark, spec, Seq((6L, "B2", "u")).toDF("dk", "seg", "__op"))
    assert(viewRows(spec) === Set((1L, 6L, 11L, Some("B2")), (2L, 6L, 20L, Some("B2"))))
  }

  test("maintainIndex fires on the metadata stale bound and restores exact pruning; healthy view is a no-op") {
    val spec = JoinView.JoinViewSpec(tmp(), Seq("pk"), "fk", "dk", Seq("seg"), numBuckets = 8)
    // every fact row references a DISTINCT fk, so index pairs == view
    // rows exactly and the stale LOWER BOUND (indexRows − viewRows)
    // equals the true stale count — the bound's tight case
    val fact = (1L to 100L).map(pk => (pk, pk, pk * 10))
    val dim = (1L to 100L).map(k => (k, s"s$k"))
    JoinView.bootstrap(spark, spec, factDf(fact), dimDf(dim))

    // healthy: zero stale pairs → metadata-only no-op
    val vIdle = CdcPipeline.currentVersion(s"${spec.viewDir}/_fkindex").get
    assert(!JoinView.maintainIndex(spark, spec, maxStalePct = 20))
    assert(CdcPipeline.currentVersion(s"${spec.viewDir}/_fkindex").get === vIdle,
      "healthy maintainIndex must publish nothing")

    // delete 30% of the fact rows: their index pairs go stale, the
    // footer bound sees exactly 30/100 > 20% and must fire
    val dels = (1L to 30L).map(pk => pk)
    JoinView.applyFactDelta(spark, spec,
      dels.toDF("pk").withColumn("fk", lit(null).cast("long"))
        .withColumn("pay", lit(null).cast("long")).withColumn("__op", lit("d")),
      dimDf(dim), Some(dels.size.toLong))
    def indexFks: Set[Long] =
      CdcPipeline.readSnapshot(spark, s"${spec.viewDir}/_fkindex").get
        .collect().map(_.getLong(0)).toSet
    assert(dels.forall(indexFks.contains), "stale pairs expected pre-maintain")
    assert(JoinView.maintainIndex(spark, spec, maxStalePct = 20),
      "30% provable staleness must cross the 20% bound")
    assert(dels.forall(d => !indexFks.contains(d)),
      "rebuild must drop every abandoned fk")
    // pruning is exact again: a dim change to a surviving key touches
    // only its referer's bucket, and a second maintainIndex is idle
    assert(!JoinView.maintainIndex(spark, spec, maxStalePct = 20))
    JoinView.applyDimDelta(spark, spec, Seq((77L, "UPD", "u")).toDF("dk", "seg", "__op"))
    val hist = CdcPipeline.describeHistory(spark, spec.viewDir).get
      .filter(col("op") === "join-view-dim")
      .select("rewritten_buckets").head()
    assert(hist.getInt(0) === 1, s"exact index must prune to one bucket: $hist")
    assert(JoinView.read(spark, spec).get
      .filter(col("fk") === 77L && col("seg") === "UPD").count() === 1L)
  }
}
