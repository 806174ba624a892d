package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import java.nio.file.Files

/** A76: identity columns. Laws: fresh inserts get unique monotone
  * ids in pk order above the seeded high-water; matched rows keep
  * their ids across payload updates; a burned reservation leaves a
  * gap but never a duplicate; RESTORE rolls data back but the
  * allocator NEVER rewinds (the Delta identity law); GENERATED
  * ALWAYS refuses explicit values; step/start are respected.
  */
class IdentitySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-ident").toString

  private def snap(dir: String): Map[Long, (Long, Long)] =
    CdcPipeline.readSnapshot(spark, dir).get
      .select("k", "sid", "v")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  /** Bootstrap: keys 0,2,4..18 with sid = k/2 + 1 (dense 1..10). */
  private def boot(dir: String): Unit = {
    CdcPipeline.publish(
      spark.range(0, 10).select((col("id") * 2).as("k"),
        (col("id") + 1).as("sid"), (col("id") * 100).as("v")),
      dir, Seq("k"), buckets = Some(8))
    ()
  }

  test("declare seeds from the existing max; inserts allocate in pk order; updates keep ids") {
    val dir = tmp()
    boot(dir)
    val spec = IdentityColumns.declare(spark, dir, "sid")
    assert(spec.highWater === 10L)
    // source: updates k=4, k=6 (payload change), inserts k=21, k=3, k=11
    val src = Seq((4L, 999L), (6L, 998L), (21L, 1L), (3L, 2L), (11L, 3L))
      .toDF("k", "v")
    val (v1, n) = IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"), src, "sid")
    assert(n === 3L && v1 === 1L)
    val s = snap(dir)
    assert(s(4L) === ((3L, 999L)), "matched row keeps sid, updates payload")
    assert(s(6L) === ((4L, 998L)))
    // fresh ids 11, 12, 13 in pk order: k=3 → 11, k=11 → 12, k=21 → 13
    assert(s(3L) === ((11L, 2L)) && s(11L) === ((12L, 3L)) && s(21L) === ((13L, 1L)))
    assert(IdentityColumns.identitySpec(dir, "sid").get.highWater === 13L)
    // all ids unique
    assert(s.values.map(_._1).toSeq.distinct.size === s.size)
  }

  test("a burned reservation leaves a gap, never a duplicate") {
    val dir = tmp()
    boot(dir)
    IdentityColumns.declare(spark, dir, "sid")
    // simulate a crash after RESERVE: bump the sidecar as a dead
    // writer that reserved 5 ids would have
    val s0 = IdentityColumns.identitySpec(dir, "sid").get
    StoreFs.writeString(s"$dir/_identity/sid",
      s"${s0.start}|${s0.step}|${s0.highWater + 5}")
    val (_, n) = IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
      Seq((100L, 1L), (101L, 2L)).toDF("k", "v"), "sid")
    assert(n === 2L)
    val ids = snap(dir).values.map(_._1).toSet
    assert(ids.contains(16L) && ids.contains(17L), "allocation starts past the burned range")
    assert(!(11L to 15L).exists(ids.contains), "burned ids stay gaps")
  }

  test("RESTORE rolls data back but the allocator never rewinds") {
    val dir = tmp()
    boot(dir)
    IdentityColumns.declare(spark, dir, "sid")
    IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
      Seq((50L, 1L), (51L, 2L)).toDF("k", "v"), "sid") // ids 11, 12
    CdcPipeline.restoreSnapshot(dir, 0L)
    assert(!snap(dir).contains(50L), "data rolled back")
    assert(IdentityColumns.identitySpec(dir, "sid").get.highWater === 12L,
      "high-water survives restore")
    IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
      Seq((60L, 3L)).toDF("k", "v"), "sid")
    assert(snap(dir)(60L)._1 === 13L,
      "post-restore ids continue above everything ever allocated")
  }

  test("GENERATED ALWAYS refuses explicit values; undeclared and bad declarations refuse") {
    val dir = tmp()
    boot(dir)
    // merge before declaration refuses
    intercept[IllegalArgumentException] {
      IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
        Seq((1L, 1L)).toDF("k", "v"), "sid")
    }
    IdentityColumns.declare(spark, dir, "sid")
    intercept[IllegalArgumentException] {
      IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
        Seq((1L, 5L, 1L)).toDF("k", "sid", "v"), "sid")
    }
    // double declaration, missing column, non-BIGINT column
    intercept[IllegalArgumentException] {
      IdentityColumns.declare(spark, dir, "sid")
    }
    intercept[IllegalArgumentException] {
      IdentityColumns.declare(spark, dir, "nope")
    }
  }

  test("start/step respected on an empty-seeded store; no-op source leaves version unmoved") {
    val dir = tmp()
    CdcPipeline.publish(
      spark.range(0, 0).select(col("id").as("k"), col("id").as("sid"),
        col("id").as("v")),
      dir, Seq("k"), buckets = Some(4))
    val spec = IdentityColumns.declare(spark, dir, "sid", start = 100L, step = 10L)
    assert(spec.highWater === 90L)
    val (_, n) = IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
      Seq((7L, 1L), (3L, 2L)).toDF("k", "v"), "sid")
    assert(n === 2L)
    val s = snap(dir)
    assert(s(3L)._1 === 100L && s(7L)._1 === 110L, "start + step in pk order")
    val v = CdcPipeline.currentVersion(dir).get
    val (v2, n2) = IdentityColumns.mergeWithIdentity(spark, dir, Seq("k"),
      spark.range(0, 0).select(col("id").as("k"), col("id").as("v")), "sid")
    assert(v2 === v && n2 === 0L)
  }
}
