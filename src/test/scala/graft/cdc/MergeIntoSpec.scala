package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import MergeInto.{src, tgt}

/** A38: the generic `whenMatched…/whenNotMatched…` MERGE surface.
  * Covers ANSI clause precedence (first match wins), conditional
  * update/delete/insert, partial-SET carry, null-safe key matching,
  * cast-to-target-type, duplicate-source rejection, and the law that
  * the fixed upsert+delete clause pair reproduces
  * `SnapshotMerge.merge` exactly over random compacted histories —
  * the pin that keeps the two merge surfaces from drifting
  * (reference anchor: bigquery_syntex_merge_sql/merge.sql:403–436).
  */
class MergeIntoSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def target =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "name", "v")

  test("conditional update / delete / insert, one pass") {
    val source = Seq(
      (1L, "A", 100, "u"),  // matched, update fires
      (2L, "B", 5, "u"),    // matched, update condition false -> carry
      (3L, "C", 99, "d"),   // matched delete
      (9L, "I", 90, "u"),   // not matched, insert fires
      (8L, "J", 80, "d"))   // not matched, insert condition false -> no-op
      .toDF("id", "name", "v", "op")
    val got = MergeInto(target, source, Seq("id"))
      .whenMatchedDelete(src("op") === "d")
      .whenMatchedUpdate(
        Map("name" -> src("name"), "v" -> src("v")),
        src("v") > tgt("v"))
      .whenNotMatchedInsert(
        Map("id" -> src("id"), "name" -> src("name"), "v" -> src("v")),
        src("op") =!= "d")
      .run()
      .as[(Long, String, Int)].collect().toSet
    assert(got === Set((1L, "A", 100), (2L, "b", 20), (4L, "d", 40),
      (9L, "I", 90)))
  }

  test("WHEN NOT MATCHED BY SOURCE: fires on unmatched target rows only, first match wins") {
    val source = Seq((1L, "A", 100)).toDF("id", "name", "v")
    val got = MergeInto(target, source, Seq("id"))
      .whenMatchedUpdate(Map("v" -> src("v")))
      .whenNotMatchedBySourceDelete(tgt("v") >= 40)
      .whenNotMatchedBySourceUpdate(Map("name" -> concat(tgt("name"), lit("!"))))
      .run().as[(Long, String, Int)].collect().toSet
    // id=1 matched (v updated); id=4 deleted by the first by-source
    // clause; id=2,3 renamed by the second; the source row never
    // inserts (no insert clause) and never receives by-source effects
    assert(got === Set((1L, "a", 100), (2L, "b!", 20), (3L, "c!", 30)))
  }

  test("first matching clause wins (ANSI precedence)") {
    val source = Seq((1L, "X", 7)).toDF("id", "name", "v")
    // Both clauses match row 1; the FIRST registered must fire.
    val got = MergeInto(target, source, Seq("id"))
      .whenMatchedUpdate(Map("name" -> lit("first")))
      .whenMatchedUpdate(Map("name" -> lit("second")))
      .run()
      .filter(col("id") === 1L).select("name").as[String].head()
    assert(got === "first")
    // Delete before update: delete wins; update before delete: update wins.
    val deleted = MergeInto(target, source, Seq("id"))
      .whenMatchedDelete()
      .whenMatchedUpdate(Map("name" -> lit("u")))
      .run().filter(col("id") === 1L).count()
    assert(deleted === 0L)
    val updated = MergeInto(target, source, Seq("id"))
      .whenMatchedUpdate(Map("name" -> lit("u")))
      .whenMatchedDelete()
      .run().filter(col("id") === 1L).select("name").as[String].head()
    assert(updated === "u")
  }

  test("partial SET carries unmentioned target columns") {
    val source = Seq((2L, "zz", 999)).toDF("id", "name", "v")
    val got = MergeInto(target, source, Seq("id"))
      .whenMatchedUpdate(Map("v" -> src("v")))
      .run()
      .filter(col("id") === 2L).as[(Long, String, Int)].head()
    assert(got === ((2L, "b", 999)), "name must carry, v must update")
  }

  test("null-safe key matching: NULL key matches NULL key, not 'never'") {
    val t = Seq((Some(1L), "a"), (None, "nullrow")).toDF("id", "name")
    val s = Seq((Some(1L), "A"), (None, "NULLROW")).toDF("id", "name")
    val got = MergeInto(t, s, Seq("id"))
      .whenMatchedUpdateAll()
      .run().select("name").as[String].collect().toSet
    assert(got === Set("A", "NULLROW"),
      "<=> join must treat the NULL-keyed rows as matched")
  }

  test("update/insert expressions cast to the target column type") {
    // v arrives as STRING on the source side; the target type is INT
    val source = Seq((1L, "42", "77"), (9L, "ins", "900")).toDF("id", "name", "v")
    val out = MergeInto(target, source, Seq("id"))
      .whenMatchedUpdate(Map("v" -> src("v")))
      .whenNotMatchedInsert(Map("id" -> src("id"), "v" -> src("v")))
      .run()
    assert(out.schema("v").dataType === target.schema("v").dataType)
    assert(out.schema("id").dataType === target.schema("id").dataType)
    val byId = out.as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(byId(1L)._3 === 77)
    assert(byId(9L) === ((9L, null, 900)),
      "insert must cast values and NULL-fill unmentioned columns")
  }

  test("duplicate source keys are rejected; skip flag and compaction both clear it") {
    val dup = Seq((1L, "x", 1), (1L, "y", 2)).toDF("id", "name", "v")
    val e = intercept[IllegalArgumentException] {
      MergeInto(target, dup, Seq("id")).whenMatchedUpdateAll().run().count()
    }
    assert(e.getMessage.contains("duplicate keys"))
    // skipDuplicateSourceCheck: caller takes responsibility
    MergeInto(target, dup.filter(col("v") === 1), Seq("id"))
      .skipDuplicateSourceCheck()
      .whenMatchedUpdateAll().run().count()
  }

  test("no insert clause keeps the plan left-outer (broadcastable delta)") {
    val source = Seq((1L, "A", 100)).toDF("id", "name", "v")
    val plan = MergeInto(target, source, Seq("id"))
      .whenMatchedUpdateAll()
      .run().queryExecution.optimizedPlan.toString
    assert(!plan.contains("FullOuter"), s"expected no full-outer join:\n$plan")
  }

  test("law: upsert+delete clause pair equals SnapshotMerge.merge over random histories") {
    val rnd = new scala.util.Random(4242)
    val targetCols = Seq("pk", CdcEnvelope.TsCol, CdcEnvelope.PosCol)
    for (trial <- 1 to 15) {
      val n = rnd.nextInt(60)
      val evs = List.tabulate(n) { i =>
        MergeLawEv(rnd.nextInt(8), if (rnd.nextInt(4) == 0) "d" else "u",
          1L + rnd.nextInt(40), i.toLong)
      }
      val env = evs.toDF("pk", CdcEnvelope.OpCol, CdcEnvelope.TsCol, CdcEnvelope.PosCol)
        .withColumn(CdcEnvelope.LoadTsCol, col(CdcEnvelope.TsCol))
        .withColumn(CdcEnvelope.DataCol, lit("{}"))
      val split = 1L + rnd.nextInt(40)
      val tgtSnap = SnapshotMerge.fromHistory(
        env.filter(col(CdcEnvelope.LoadTsCol) <= split), Seq("pk"), targetCols)
      val changes = ChangeCompaction.compactForMerge(
        env.filter(col(CdcEnvelope.LoadTsCol) > split), Seq("pk"))
      val viaSnapshot = SnapshotMerge.merge(tgtSnap, changes, Seq("pk"))
        .select(targetCols.map(col): _*).as[(Int, Long, Long)].collect().toSet
      val viaMergeInto = MergeInto(tgtSnap, changes, Seq("pk"))
        .whenMatchedDelete(src(CdcEnvelope.OpCol) === CdcEnvelope.Delete)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll(src(CdcEnvelope.OpCol) =!= CdcEnvelope.Delete)
        .run()
        .select(targetCols.map(col): _*).as[(Int, Long, Long)].collect().toSet
      assert(viaMergeInto === viaSnapshot, s"trial=$trial evs=$evs split=$split")
    }
  }
}
