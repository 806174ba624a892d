package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.LocalSpark
import java.nio.file.Files

/** A73: DESCRIBE DETAIL — the one-row operational summary from
  * driver metadata + parquet footers only (zero Spark jobs). The
  * spec builds a store exercising every inventoried surface (MoR
  * delete → DV, constraint, generated column, default, bloom index)
  * and pins each reported field against independently-derived truth.
  */
class DescribeDetailSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft").toString

  test("every inventory field reflects the store's actual state; zero Spark jobs") {
    val dir = tmp()
    CdcPipeline.publish(
      spark.range(0, 100).select(col("id"), (col("id") % 10).as("v"),
        concat(lit("t"), col("id")).as("tag")),
      dir, Seq("id"), buckets = Some(8))
    CdcPipeline.deleteWhereMoR(spark, dir, Seq("id"), col("id") < 7)
    CdcPipeline.addCheckConstraint(spark, dir, "nonneg_v", "v >= 0")
    CdcPipeline.addGeneratedColumn(dir, "v2", LongType, "v * 2")
    CdcPipeline.addColumnWithDefault(spark, dir, "score", LongType, 5L)
    CdcPipeline.buildBloomIndex(spark, dir, "tag", 100L)

    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val d = CdcPipeline.describeDetail(spark, dir).get.collect()(0)
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      === jobsBefore, "describeDetail must run zero Spark jobs")

    assert(d.getAs[Long]("version") === CdcPipeline.currentVersion(dir).get)
    assert(d.getAs[Long]("num_buckets") === 8L)
    assert(d.getAs[Long]("footer_rows") === 100L)
    assert(d.getAs[Long]("dv_rows") === 7L)
    assert(d.getAs[Long]("live_rows") === 93L)
    assert(d.getAs[Long]("live_rows")
      === CdcPipeline.readSnapshot(spark, dir).get.count())
    // schema: id, v, tag + the defaulted physical column (virtual v2
    // is presentation-layer, deliberately NOT a schema field)
    assert(d.getAs[Long]("schema_fields") === 4L)
    assert(d.getAs[String]("constraints") === "nonneg_v")
    assert(d.getAs[String]("generated_columns") === "v2")
    assert(d.getAs[String]("column_defaults") === "score")
    assert(d.getAs[String]("bloom_columns") === "tag")
    assert(d.getAs[String]("last_op") === "bloom-index")
    assert(d.getAs[Long]("commit_us") > 0L)
    assert(d.getAs[Long]("readable_versions") === 6L) // v0..v5
    assert(d.getAs[Long]("num_files") >= 8L && d.getAs[Long]("bytes") > 0L)
    // SQL twin
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(s"SELECT * FROM graft_detail('$dir')").collect()(0)
    assert(viaSql === d)
    StoreFs.deleteRecursive(dir)
  }
}
