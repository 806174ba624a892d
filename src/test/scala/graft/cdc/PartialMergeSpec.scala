package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.LocalSpark
import graft.cdc.TypedProjection.{Cast, FieldSpec}

/** A87: column-level last-writer-wins merge of sparse patches. The
  * laws: each field independently takes the latest event that SET
  * it; deletes never leak pre-delete values into resurrected rows; a
  * field-less upsert still asserts existence; and when every patch
  * is a full-row image the result degenerates to the row-level
  * SnapshotMerge (the pin that keeps the two merge surfaces from
  * drifting).
  */
class PartialMergeSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val fields = Seq(FieldSpec("a", Cast(LongType)), FieldSpec("b", Cast(LongType)))

  private def env(rows: (Long, String, Long, Long, String)*) =
    rows.toSeq.toDF("user_id", CdcEnvelope.OpCol, CdcEnvelope.TsCol,
      CdcEnvelope.PosCol, CdcEnvelope.DataCol)

  private def base(rows: (Long, java.lang.Long, java.lang.Long)*) =
    rows.toSeq.toDF("user_id", "a", "b")

  private def got(e: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
    PartialMerge.merge(e, b, Seq("user_id"), fields)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq

  test("per-field LWW: each field takes the latest event that set it; unset fields fall back to base") {
    val e = env(
      (1L, "u", 100L, 1L, """{"a":10}"""),
      (1L, "u", 200L, 2L, """{"b":20}"""),
      (1L, "u", 300L, 3L, """{"a":30}"""),  // a from t=300, b from t=200
      (2L, "u", 100L, 4L, """{"b":99}"""),  // b patched, a carries from base
      (5L, "u", 100L, 5L, """{"a":50,"b":51}""")) // sparse insert, no base row
    val b = base((1L, 1L, 2L), (2L, 3L, 4L), (9L, 7L, 8L))
    assert(got(e, b) === Seq(
      (1L, Some(30L), Some(20L)),
      (2L, Some(3L), Some(99L)),
      (5L, Some(50L), Some(51L)),
      (9L, Some(7L), Some(8L)))) // untouched base carries
  }

  test("deletes: tombstone kills the row; resurrect never leaks pre-delete values; touch-only resurrect is all-NULL") {
    val e = env(
      (1L, "u", 100L, 1L, """{"a":10,"b":11}"""),
      (1L, "d", 200L, 2L, "{}"),
      (1L, "u", 300L, 3L, """{"b":33}"""),  // resurrected: a must be NULL, not 10 or base
      (2L, "d", 100L, 4L, "{}"),            // deleted base row, never resurrected
      (3L, "d", 100L, 5L, "{}"),
      (3L, "u", 200L, 6L, "{}"))            // field-less touch after delete: exists, all NULL
    val b = base((1L, 1L, 2L), (2L, 3L, 4L))
    assert(got(e, b) === Seq(
      (1L, None, Some(33L)),
      (3L, None, None)))
  }

  test("tiebreak: same timestamp resolves by position, strictly after a same-ts delete") {
    val e = env(
      (1L, "u", 100L, 1L, """{"a":1}"""),
      (1L, "d", 100L, 2L, "{}"),
      (1L, "u", 100L, 3L, """{"a":3}""")) // pos 3 > delete pos 2 → survives
    assert(got(e, base()) === Seq((1L, Some(3L), None)))
  }

  test("full-row patches degenerate to the row-level SnapshotMerge") {
    val r = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val u = r.nextInt(20).toLong
      val op = if (r.nextInt(5) == 0) "d" else "u"
      (u, op, (100 + i).toLong, i.toLong,
        s"""{"a":${r.nextInt(100)},"b":${r.nextInt(100)}}""")
    }
    val e = env(rows: _*)
    val b = base((0L until 10L).map(u => (u, java.lang.Long.valueOf(u), java.lang.Long.valueOf(u * 2))): _*)
    val partial = got(e, b)
    val typed = e
      .withColumn("a", get_json_object(col(CdcEnvelope.DataCol), "$.a").cast("long"))
      .withColumn("b", get_json_object(col(CdcEnvelope.DataCol), "$.b").cast("long"))
    val compacted = ChangeCompaction.compactForMerge(typed, Seq("user_id"))
    val rowLevel = SnapshotMerge.merge(b, compacted, Seq("user_id"))
      .orderBy("user_id").collect()
      .map(r2 => (r2.getLong(0), Option(r2.get(1)), Option(r2.get(2)))).toSeq
    assert(partial === rowLevel,
      "full-row patches must reproduce row-level merge exactly")
  }

  test("store integration: windowed replay ≡ one-shot; each window rewrites only its touched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pm").toString
    val r = new scala.util.Random(11)
    // 3 time-ordered windows of sparse patches over 40 PKs
    val all = (1 to 600).map { i =>
      val u = r.nextInt(40).toLong
      val op = if (r.nextInt(8) == 0) "d" else "u"
      val fieldsJson =
        if (op == "d") "{}"
        else (Seq.empty[String]
          ++ (if (r.nextBoolean()) Seq(s""""a":${r.nextInt(100)}""") else Nil)
          ++ (if (r.nextInt(3) == 0) Seq(s""""b":${r.nextInt(100)}""") else Nil))
          .mkString("{", ",", "}")
      (u, op, (1000 + i).toLong, i.toLong, fieldsJson)
    }
    val windows = all.grouped(200).toSeq
    var versions = Seq.empty[Long]
    windows.zipWithIndex.foreach { case (w, i) =>
      versions :+= PartialMerge.mergeAndPublish(spark, dir, Seq("user_id"),
        fields, env(w: _*), batchId = i.toLong, numBuckets = Some(8))
    }
    assert(versions === Seq(0L, 1L, 2L))

    val replayed = CdcPipeline.readSnapshot(spark, dir).get
      .orderBy("user_id").collect()
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSeq
    val oneShot = got(env(all: _*),
      base((0L until 0L).map(u => (u, null: java.lang.Long, null: java.lang.Long)): _*))
    assert(replayed === oneShot, "windowed store replay ≡ one-shot partial merge")

    // delta pricing: a 2-PK window rewrites ≤ 2 buckets, carries the rest
    val before = CdcPipeline.manifest(dir, 2L).get
    PartialMerge.mergeAndPublish(spark, dir, Seq("user_id"), fields,
      env((1L, "u", 9000L, 9000L, """{"a":777}"""),
        (2L, "u", 9001L, 9001L, """{"b":888}""")))
    val after = CdcPipeline.manifest(dir, 3L).get
    val rewritten = after.buckets.filter { case (b, ref) =>
      before.buckets.get(b) != Some(ref) }.keySet
    assert(rewritten.size <= 2, s"rewrote $rewritten for a 2-PK window")
    val snap = CdcPipeline.readSnapshot(spark, dir).get
    assert(snap.filter(col("user_id") === 1L).select("a")
      .collect()(0).getLong(0) === 777L)
    assert(snap.filter(col("user_id") === 2L).select("b")
      .collect()(0).getLong(0) === 888L)
  }

  test("randomized law: merge ≡ a driver-side reference model over 200 random sparse histories") {
    // Reference model: literal per-PK event replay in plain Scala —
    // independent of every Spark mechanism the operator uses.
    def reference(evs: Seq[(Long, String, Long, Long, String)],
        b: Map[Long, (Option[Long], Option[Long])]): Map[Long, (Option[Long], Option[Long])] = {
      val byPk = evs.groupBy(_._1)
      val pks = byPk.keySet ++ b.keySet
      pks.flatMap { pk =>
        val h = byPk.getOrElse(pk, Nil).sortBy(e => (e._3, e._4))
        val lastDel = h.filter(_._2 == "d").lastOption.map(e => (e._3, e._4))
        val ord = Ordering.Tuple2[Long, Long]
        val after = h.filter(e => e._2 == "u" &&
          lastDel.forall(ld => ord.gt((e._3, e._4), ld)))
        def field(k: String): Option[Long] = {
          val set = after.flatMap { e =>
            val m = s""""$k":(-?\\d+)""".r.findFirstMatchIn(e._5)
            m.map(_.group(1).toLong)
          }
          set.lastOption.orElse(
            if (lastDel.isEmpty) b.get(pk).flatMap(v => if (k == "a") v._1 else v._2)
            else None)
        }
        val exists = after.nonEmpty || (b.contains(pk) && lastDel.isEmpty)
        if (exists) Some(pk -> (field("a"), field("b"))) else None
      }.toMap
    }
    val r = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val evs = (1 to 200).map { i =>
        val u = r.nextInt(15).toLong
        val op = if (r.nextInt(6) == 0) "d" else "u"
        val js =
          if (op == "d") "{}"
          else (Seq.empty[String]
            ++ (if (r.nextBoolean()) Seq(s""""a":${r.nextInt(50)}""") else Nil)
            ++ (if (r.nextBoolean()) Seq(s""""b":${r.nextInt(50)}""") else Nil))
            .mkString("{", ",", "}")
        // random ts with collisions; pos is the unique tiebreak
        (u, op, (r.nextInt(20) * 10).toLong, i.toLong, js)
      }
      val baseMap = (0L until 8L).map(u =>
        u -> (Some(u * 10): Option[Long], Some(u * 20): Option[Long])).toMap
      val expected = reference(evs, baseMap)
      val actual = got(env(evs: _*),
        base(baseMap.toSeq.map { case (k, (a, b0)) =>
          (k, a.map(java.lang.Long.valueOf).orNull, b0.map(java.lang.Long.valueOf).orNull)
        }: _*)).map(t => t._1 -> (t._2.map(_.asInstanceOf[Long]), t._3.map(_.asInstanceOf[Long]))).toMap
      assert(actual === expected, s"trial $trial diverged from the reference model")
    }
  }

  test("base with undeclared columns is refused") {
    val e = env((1L, "u", 100L, 1L, """{"a":1}"""))
    val badBase = base((1L, 1L, 2L)).withColumn("extra", lit(0L))
    val err = intercept[IllegalArgumentException] {
      PartialMerge.merge(e, badBase, Seq("user_id"), fields)
    }
    assert(err.getMessage.contains("extra"))
  }

  test("store integration refuses a wider target schema (r9 ADVICE: no silent narrowing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pm-wide").toString
    // target carries an UNDECLARED column `extra` next to pk + a + b
    CdcPipeline.publish(
      spark.range(0, 20).select(col("id").as("user_id"),
        col("id").as("a"), (col("id") * 2).as("b"),
        concat(lit("x"), col("id")).as("extra")),
      dir, Seq("user_id"), buckets = Some(4))
    val e = intercept[IllegalArgumentException] {
      PartialMerge.mergeAndPublish(spark, dir, Seq("user_id"), fields,
        env((1L, "u", 100L, 1L, """{"a":9}""")))
    }
    assert(e.getMessage.contains("must cover the target's schema exactly"))
    // and the store is untouched — no narrowed version was published
    assert(CdcPipeline.currentVersion(dir).contains(0L))
    assert(CdcPipeline.readSnapshot(spark, dir).get.columns.toSet ===
      Set("user_id", "a", "b", "extra"))
    StoreFs.deleteRecursive(dir)
  }
}
