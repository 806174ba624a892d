package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import java.nio.file.Files

/** A86: row-filter + column-mask policy reads. The laws that make a
  * policy a security boundary rather than a convenience: masks see
  * RAW rows (never each other's outputs), the row filter runs before
  * any mask AND pushes into the parquet scan, the stored schema is
  * preserved, and a typo'd mask refuses instead of silently masking
  * nothing.
  */
class SecuritySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft").toString

  private def store(): String = {
    val dir = tmp()
    val df = spark.range(0, 200).select(col("id"),
      (col("id") % 10).as("region"), (col("id") * 7).as("salary"))
    CdcPipeline.publish(df, dir, Seq("id"), buckets = Some(8))
    dir
  }

  test("masks see raw columns, never each other's outputs; schema and types preserved") {
    val dir = store()
    // Both masks reference `region`; region is ITSELF masked. If
    // masks cascaded, salary's CASE would see the constant 99 and
    // redact everything.
    val got = Security.readSecured(spark, dir, SecurityPolicy(
      masks = Map(
        "region" -> "99",
        "salary" -> "CASE WHEN region < 5 THEN salary ELSE -1 END"))).get
    val raw = CdcPipeline.readSnapshot(spark, dir).get
    // names and types are the contract; a constant mask may TIGHTEN
    // nullability, which breaks no consumer
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      raw.schema.map(f => (f.name, f.dataType)),
      "a policy must not change column names or types")
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 == 99L), "region masked to the constant")
    assert(rows.forall { case (id, _, sal) =>
      if (id % 10 < 5) sal == id * 7 else sal == -1L
    }, "salary mask evaluated against the RAW region")
  }

  test("row filter sees raw rows, runs before masks, and pushes into the scan") {
    val dir = store()
    val got = Security.readSecured(spark, dir, SecurityPolicy(
      rowFilter = Some("salary < 700"),
      masks = Map("salary" -> "CAST(NULL AS BIGINT)"))).get
    // filter on the RAW salary even though salary itself is masked out
    assert(got.count() === 100L)
    assert(got.filter(col("salary").isNotNull).count() === 0L)
    // the predicate reaches the parquet scan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(salary,700)"),
      s"row filter must push down, plan was:\n$plan")
  }

  test("securedView composes with time travel: a policy over v0 sees the OLD rows, masked") {
    val dir = store()
    CdcPipeline.updateWhere(spark, dir, Seq("id"),
      col("id") === 7, Map("salary" -> (col("salary") + 1000L))) // v1
    val policy = SecurityPolicy(rowFilter = Some("id = 7"),
      masks = Map("region" -> "-1"))
    val v0 = Security.securedView(
      CdcPipeline.readSnapshotAt(spark, dir, 0L).get, policy).collect()(0)
    val v1 = Security.readSecured(spark, dir, policy).get.collect()(0)
    assert(v0.getLong(2) === 49L && v1.getLong(2) === 1049L,
      "the policy wraps ANY reader: time travel serves the old value")
    assert(v0.getLong(1) === -1L && v1.getLong(1) === -1L,
      "masks apply identically on both versions")
  }

  test("unknown mask column refuses; empty policy is the identity") {
    val dir = store()
    val e = intercept[IllegalArgumentException] {
      Security.readSecured(spark, dir, SecurityPolicy(
        masks = Map("salry" -> "0")))
    }
    assert(e.getMessage.contains("salry"))
    val id = Security.readSecured(spark, dir, SecurityPolicy()).get
    assert(id.orderBy("id").collect().toSeq ===
      CdcPipeline.readSnapshot(spark, dir).get.orderBy("id").collect().toSeq)
  }
}
