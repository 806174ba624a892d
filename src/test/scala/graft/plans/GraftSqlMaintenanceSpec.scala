package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import graft.cdc.{CdcPipeline, StoreFs}

/** A92: the statement-level maintenance verbs (OPTIMIZE / VACUUM /
  * DESCRIBE HISTORY / RESTORE) — front-parsed (they are not in
  * Spark's grammar), each a veneer over the same Scala op its TVF
  * twin calls; non-graft statements fall through to the delegate
  * parser untouched.
  */
class GraftSqlMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = { val s = LocalSpark.spark; graft.GraftExtensions.register(s); s }

  test("OPTIMIZE / ZORDER / DESCRIBE HISTORY / RESTORE / VACUUM statement lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("graft-maint").toString
    StoreFs.deleteRecursive(dir)

    spark.sql(
      s"""CREATE TABLE graft.`$dir` TBLPROPERTIES('pk'='id', 'buckets'='4')
         |AS SELECT id, id * 2 AS v FROM range(0, 40)""".stripMargin).collect()
    spark.sql(s"UPDATE graft.`$dir` SET v = v + 1 WHERE id < 5").collect()
    val sumAfterUpdate = CdcPipeline.readSnapshot(spark, dir).get
      .agg(sum("v")).collect()(0).getLong(0)

    // bare OPTIMIZE clusters by the _PK sidecar key; content unchanged
    val v2 = spark.sql(s"OPTIMIZE graft.`$dir`").collect()
    assert(v2.map(_.getLong(0)).toSeq === Seq(2L))
    assert(CdcPipeline.readSnapshot(spark, dir).get
      .agg(sum("v")).collect()(0).getLong(0) === sumAfterUpdate)

    // ZORDER BY two dims; content unchanged again
    val v3 = spark.sql(s"OPTIMIZE graft.`$dir` ZORDER BY (id, v)").collect()
    assert(v3.map(_.getLong(0)).toSeq === Seq(3L))
    assert(CdcPipeline.readSnapshot(spark, dir).get.count() === 40L)

    // DESCRIBE HISTORY: newest first, one row per version, op labels
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$dir`").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L, 0L))
    assert(hist.head.getString(1) === "zorder")

    // RESTORE to the CTAS state: a NEW version (4) with v0's content
    val v4 = spark.sql(s"RESTORE TABLE graft.`$dir` TO VERSION AS OF 0").collect()
    assert(v4.map(_.getLong(0)).toSeq === Seq(4L))
    val restored = CdcPipeline.readSnapshot(spark, dir).get
    assert(restored.filter(col("id") < 5 && col("v") % 2 =!= 0).count() === 0L)
    assert(restored.count() === 40L)

    // DRY RUN lists reclaimable (version, bytes) and touches nothing
    val dry = spark.sql(s"VACUUM graft.`$dir` RETAIN 2 VERSIONS DRY RUN").collect()
    assert(dry.forall(_.getLong(1) > 0L))
    val dryVersions = dry.map(_.getLong(0)).toSet
    assert(dryVersions.nonEmpty && dryVersions.subsetOf(Set(1L, 2L, 3L)))
    assert(CdcPipeline.readSnapshotAt(spark, dir, 3L).isDefined) // untouched

    // the real VACUUM reclaims exactly what the preview listed;
    // current version (and what it references) stays fully readable
    val gone = spark.sql(s"VACUUM graft.`$dir` RETAIN 2 VERSIONS").collect()
      .map(_.getLong(0)).toSet
    assert(gone === dryVersions)
    assert(CdcPipeline.readSnapshot(spark, dir).get.count() === 40L)

    // unknown version: RESTORE emits no row rather than guessing
    assert(spark.sql(s"RESTORE TABLE graft.`$dir` TO VERSION AS OF 99").collect().isEmpty)

    StoreFs.deleteRecursive(dir)
  }

  test("SHOW CREATE TABLE round-trips; SHALLOW CLONE statement clones zero-copy") {
    val dir = java.nio.file.Files.createTempDirectory("graft-showddl").toString
    StoreFs.deleteRecursive(dir)
    spark.sql(
      s"""CREATE TABLE graft.`$dir` TBLPROPERTIES('pk'='id', 'buckets'='2', 'team'='x')
         |AS SELECT id, CAST(id AS DOUBLE) / 2 AS score FROM range(0, 10)""".stripMargin)
      .collect()
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT nonneg CHECK (id >= 0)").collect()

    val stmt = spark.sql(s"SHOW CREATE TABLE graft.`$dir`").collect()(0).getString(0)
    assert(stmt.contains(s"CREATE TABLE graft.`$dir`"))
    assert(stmt.contains("id BIGINT"))
    assert(stmt.contains("score DOUBLE"))
    assert(stmt.contains("'pk'='id'") && stmt.contains("'buckets'='2'") &&
      stmt.contains("'team'='x'"))
    assert(stmt.contains("ADD CONSTRAINT nonneg CHECK"))

    val cloneDir = s"${dir}_clone"
    val v = spark.sql(s"CREATE TABLE graft.`$cloneDir` SHALLOW CLONE graft.`$dir`")
      .collect()
    assert(v.map(_.getLong(0)).toSeq === Seq(0L))
    assert(CdcPipeline.readSnapshot(spark, cloneDir).get.count() === 10L)
    // shallow: the clone's v0 references the source's files (no copy)
    val ownBytes = StoreFs.treeBytes(s"$cloneDir/v0")
    assert(ownBytes < StoreFs.treeBytes(s"$dir/v0"),
      s"shallow clone copied data ($ownBytes bytes)")

    StoreFs.deleteRecursive(dir); StoreFs.deleteRecursive(cloneDir)
  }

  test("TRUNCATE / SHOW TBLPROPERTIES / ANALYZE statements") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trunc").toString
    StoreFs.deleteRecursive(dir)
    spark.sql(
      s"""CREATE TABLE graft.`$dir` TBLPROPERTIES('pk'='id', 'buckets'='2', 'team'='x')
         |AS SELECT id, id % 7 AS v FROM range(0, 30)""".stripMargin).collect()

    // SHOW TBLPROPERTIES: all, then one key, then an absent key
    val all = spark.sql(s"SHOW TBLPROPERTIES graft.`$dir`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(all === Seq(("team", "x")))
    assert(spark.sql(s"SHOW TBLPROPERTIES graft.`$dir` ('team')").collect()
      .map(_.getString(1)).toSeq === Seq("x"))
    assert(spark.sql(s"SHOW TBLPROPERTIES graft.`$dir` ('nope')").collect().isEmpty)

    // ANALYZE FOR COLUMNS builds the A83 NDV index
    val an = spark.sql(
      s"ANALYZE TABLE graft.`$dir` COMPUTE STATISTICS FOR COLUMNS v").collect()(0)
    assert(an.getString(1) === "v")
    assert(CdcPipeline.estimateJoinRows(spark, dir, dir, "v").isDefined,
      "the NDV index must be consumable by the A88 estimator")

    // DESCRIBE / SHOW COLUMNS introspection
    val desc = spark.sql(s"DESCRIBE graft.`$dir`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc === Seq(("id", "bigint"), ("v", "bigint")))
    val ext = spark.sql(s"DESCRIBE EXTENDED graft.`$dir`").collect()
      .map(_.getString(0))
    assert(ext.contains("Primary Key") && ext.contains("Property: team"))
    assert(spark.sql(s"SHOW COLUMNS IN graft.`$dir`").collect()
      .map(_.getString(0)).toSeq === Seq("id", "v"))

    // TRUNCATE: empty current version, schema + properties intact,
    // pre-truncate data still reachable by time travel
    val tr = spark.sql(s"TRUNCATE TABLE graft.`$dir`").collect()(0)
    assert(tr.getLong(1) === 30L)
    assert(CdcPipeline.readSnapshot(spark, dir).get.count() === 0L)
    assert(CdcPipeline.readSnapshot(spark, dir).get.columns.toSeq === Seq("id", "v"))
    assert(CdcPipeline.tableProperties(dir).get("team").contains("x"))
    assert(CdcPipeline.readSnapshotAt(spark, dir, tr.getLong(0) - 1)
      .map(_.count()).contains(30L), "history must survive TRUNCATE")
    // the store still accepts statements after the truncate
    spark.sql(s"INSERT INTO graft.`$dir` SELECT id, id AS v FROM range(0, 3)").collect()
    assert(CdcPipeline.readSnapshot(spark, dir).get.count() === 3L)

    StoreFs.deleteRecursive(dir)
  }

  test("CREATE OR REPLACE redefines schema as a new version; RESTORE TO TIMESTAMP") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replace").toString
    StoreFs.deleteRecursive(dir)
    spark.sql(
      s"""CREATE TABLE graft.`$dir` TBLPROPERTIES('pk'='id', 'buckets'='2')
         |AS SELECT id, id * 2 AS v FROM range(0, 10)""".stripMargin).collect()
    val t0 = CdcPipeline.manifest(dir, 0L).get.meta("commit_us").toLong

    // REPLACE: new schema (v dropped, w added), history intact
    val rv = spark.sql(
      s"""CREATE OR REPLACE TABLE graft.`$dir`
         |AS SELECT id, CAST(id AS STRING) AS w FROM range(0, 5)""".stripMargin)
      .collect()(0).getLong(0)
    assert(rv === 1L)
    val snap = CdcPipeline.readSnapshot(spark, dir).get
    assert(snap.columns.toSeq === Seq("id", "w") && snap.count() === 5L)
    assert(CdcPipeline.readSnapshotAt(spark, dir, 0L).map(_.count()).contains(10L),
      "pre-replace history must stay time-travelable")
    // changing the PK is a rebucket, not a replace — refused
    val e = intercept[Exception] {
      spark.sql(s"""CREATE OR REPLACE TABLE graft.`$dir`
                   |TBLPROPERTIES('pk'='w') AS SELECT 'x' AS w""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("cannot change the PK"))

    // RESTORE by timestamp: the version serving at the bootstrap's
    // commit time is v0
    val rr = spark.sql(
      s"RESTORE TABLE graft.`$dir` TO TIMESTAMP AS OF '$t0'").collect()
    assert(rr.map(_.getLong(0)).toSeq === Seq(2L))
    assert(CdcPipeline.readSnapshot(spark, dir).get.columns.toSeq === Seq("id", "v"))
    assert(CdcPipeline.readSnapshot(spark, dir).get.count() === 10L)

    StoreFs.deleteRecursive(dir)
  }

  test("non-graft OPTIMIZE falls through to the delegate parser and fails there") {
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("OPTIMIZE some_table")
    }
  }
}
