package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import graft.cdc.{CdcPipeline, StoreFs}

/** A91: the statement-level DDL lifecycle — CTAS bootstrap, column
  * evolution, properties, CHECK constraints, drop — each statement a
  * veneer over the same Scala op its TVF twin calls.
  */
class GraftSqlDdlSpec extends AnyFunSuite {
  private lazy val spark = { val s = LocalSpark.spark; graft.GraftExtensions.register(s); s }

  test("CTAS -> ALTER (columns, props, constraints) -> DML interop -> DROP") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ddl").toString
    StoreFs.deleteRecursive(dir) // CTAS wants to create it

    // CTAS: pk + bucket count + a custom property via TBLPROPERTIES
    spark.sql(
      s"""CREATE TABLE graft.`$dir`
         |TBLPROPERTIES('pk'='id', 'buckets'='4', 'team'='curation')
         |AS SELECT id, id * 2 AS v FROM range(0, 40)""".stripMargin).collect()
    assert(CdcPipeline.pkColumns(dir).contains(Seq("id")))
    assert(CdcPipeline.fastCount(dir).contains(40L))
    assert(CdcPipeline.manifest(dir, 0L).get.numBuckets === 4)
    assert(CdcPipeline.tableProperties(dir).get("team").contains("curation"))
    // a second CTAS refuses; IF NOT EXISTS no-ops
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dir` TBLPROPERTIES('pk'='id') AS SELECT 1 AS id")
        .collect()
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$dir` TBLPROPERTIES('pk'='id') " +
      "AS SELECT 1 AS id").collect()
    assert(CdcPipeline.fastCount(dir).contains(40L))
    // pk-less CTAS is refused with guidance
    val noPk = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${dir}_x` AS SELECT 1 AS id").collect()
    }
    assert(noPk.getMessage.contains("'pk'"))

    // ADD COLUMN with the required DEFAULT: metadata-only, carried
    // buckets read the default
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN w BIGINT DEFAULT 7").collect()
    val snap = CdcPipeline.readSnapshot(spark, dir).get
    assert(snap.columns.toSet === Set("id", "v", "w"))
    assert(snap.filter(col("w") === 7L).count() === 40L)
    val noDefault = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN z BIGINT").collect()
    }
    assert(noDefault.getMessage.contains("DEFAULT"), noDefault.getMessage)

    // SET / UNSET TBLPROPERTIES
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('retention'='30d')").collect()
    assert(CdcPipeline.tableProperties(dir).get("retention").contains("30d"))
    spark.sql(s"ALTER TABLE graft.`$dir` UNSET TBLPROPERTIES('retention')").collect()
    assert(!CdcPipeline.tableProperties(dir).contains("retention"))

    // CHECK constraint gates a statement UPDATE, then drops
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT v_pos CHECK (v >= 0)").collect()
    val viol = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$dir` SET v = -5 WHERE id = 1").collect()
    }
    assert(viol.getMessage.toLowerCase.contains("constraint"), viol.getMessage)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT v_pos").collect()
    spark.sql(s"UPDATE graft.`$dir` SET v = -5 WHERE id = 1").collect()
    assert(CdcPipeline.readSnapshot(spark, dir).get
      .filter(col("id") === 1L).collect()(0).getAs[Long]("v") === -5L)

    // RENAME a non-key column, then DROP it
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN w TO w2").collect()
    assert(CdcPipeline.readSnapshot(spark, dir).get.columns.contains("w2"))
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN w2").collect()
    assert(CdcPipeline.readSnapshot(spark, dir).get.columns.toSet === Set("id", "v"))

    // RENAME the PK column: the _PK sidecar follows, DML still works.
    // Spell the source name in a DIFFERENT case than the sidecar
    // records — Spark resolution is case-insensitive, and an exact-
    // match sidecar rewrite would leave a stale _PK naming a now-
    // nonexistent column (r10 advice)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN ID TO key").collect()
    assert(CdcPipeline.pkColumns(dir).contains(Seq("key")))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE key >= 35").collect()
    assert(CdcPipeline.fastCount(dir).contains(35L))

    // DROP TABLE removes the store; IF EXISTS tolerates absence
    spark.sql(s"DROP TABLE graft.`$dir`").collect()
    assert(CdcPipeline.currentVersion(dir).isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS graft.`$dir`").collect()
    intercept[Exception] { spark.sql(s"DROP TABLE graft.`$dir`").collect() }
  }
}
