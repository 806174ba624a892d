package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import java.nio.file.Files

/** A77: table properties. Laws: set/overwrite/unset round-trip
  * (including encoder-hostile values); the declaration carries across
  * every publish kind; RESTORE reverts the property set (per-version
  * log state — the Delta semantic, deliberately unlike the A76
  * identity sidecar); policyFromProperties parses knobs/off/malformed
  * loudly; maintainAuto obeys the table's own declared policy.
  */
class TablePropsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val P = CdcPipeline

  private def tmp(): String = Files.createTempDirectory("graft-props").toString

  private def boot(dir: String, n: Int = 1000): Unit = {
    P.publish(spark.range(0, n).select(col("id"), (col("id") % 50L).as("v")),
      dir, Seq("id"), buckets = Some(8))
    ()
  }

  test("set / overwrite / unset round-trip, hostile values encoded, refusals") {
    val dir = tmp(); boot(dir)
    assert(P.tableProperties(dir).isEmpty)
    P.setTableProperties(dir, Map("owner" -> "ingest-team", "pii" -> "true"))
    assert(P.tableProperties(dir) ===
      Map("owner" -> "ingest-team", "pii" -> "true"))
    P.setTableProperties(dir, Map("owner" -> "core|team\nwith=chars"))
    assert(P.tableProperties(dir)("owner") === "core|team\nwith=chars",
      "hostile characters must round-trip through the stat encoding")
    assert(P.unsetTableProperties(dir, Seq("pii")).isDefined)
    assert(P.tableProperties(dir) === Map("owner" -> "core|team\nwith=chars"))
    assert(P.unsetTableProperties(dir, Seq("missing")).isEmpty,
      "unset of an absent key is a no-op None")
    intercept[IllegalArgumentException] {
      P.setTableProperties(dir, Map("bad key" -> "x"))
    }
    intercept[IllegalArgumentException] {
      P.setTableProperties(dir, Map.empty)
    }
  }

  test("properties carry across every publish kind and revert on RESTORE") {
    val dir = tmp(); boot(dir)
    P.setTableProperties(dir, Map("owner" -> "a", "tier" -> "gold"))
    val vProps = P.currentVersion(dir).get
    // delta publish (updateWhere), optimize, bloom index, constraint,
    // rebucket — the full carry gauntlet
    P.updateWhere(spark, dir, Seq("id"), col("id") < 10,
      Map("v" -> (col("v") + 1L)))
    assert(P.tableProperties(dir)("tier") === "gold", "survives updateWhere")
    P.optimize(spark, dir, Seq("id"), Seq("id"))
    assert(P.tableProperties(dir)("tier") === "gold", "survives optimize")
    P.buildBloomIndex(spark, dir, "v", expectedPerBucket = 1000L)
    assert(P.tableProperties(dir)("tier") === "gold", "survives bloom index")
    P.addCheckConstraint(spark, dir, "v_ok", "v >= 0")
    assert(P.tableProperties(dir)("tier") === "gold", "survives add-constraint")
    P.rebucket(spark, dir, Seq("id"), 4)
    assert(P.tableProperties(dir)("tier") === "gold", "survives rebucket")
    // a later property change, then restore to before it
    P.setTableProperties(dir, Map("tier" -> "bronze"))
    assert(P.tableProperties(dir)("tier") === "bronze")
    P.restoreSnapshot(dir, vProps)
    assert(P.tableProperties(dir)("tier") === "gold",
      "RESTORE must revert properties with the state")
    // describeDetail inventories them
    val det = P.describeDetail(spark, dir).get.select("properties").head.getString(0)
    assert(det.contains("tier=gold") && det.contains("owner=a"), det)
  }

  test("policyFromProperties: knobs, off, csv, booleans, malformed throws") {
    val dir = tmp(); boot(dir)
    val base = P.policyFromProperties(dir)
    assert(base === P.MaintenancePolicy(), "no properties → base policy")
    P.setTableProperties(dir, Map(
      "graft.maintain.dvFoldPct" -> "25",
      "graft.maintain.smallFilesPerBucket" -> "off",
      "graft.maintain.keepVersions" -> "7",
      "graft.maintain.sortCols" -> "v, id",
      "graft.maintain.symlinkManifest" -> "true"))
    val p = P.policyFromProperties(dir)
    assert(p.dvFoldPct === Some(25))
    assert(p.smallFilesPerBucket === None)
    assert(p.keepVersions === Some(7))
    assert(p.sortCols === Seq("v", "id"))
    assert(p.symlinkManifest === true)
    assert(p.bloomRebuildPct === P.MaintenancePolicy().bloomRebuildPct,
      "unset knobs keep base values")
    P.setTableProperties(dir, Map("graft.maintain.keepVersions" -> "soon"))
    intercept[NumberFormatException] { P.policyFromProperties(dir) }
  }

  test("maintainAuto obeys the table's declared policy") {
    val dir = tmp(); boot(dir)
    // build up versions, then a full rewrite so the old version dirs
    // lose their carried references and become vacuum-reclaimable
    (1 to 4).foreach { i =>
      P.updateWhere(spark, dir, Seq("id"), col("id") === i.toLong,
        Map("v" -> lit(i.toLong)))
    }
    P.optimize(spark, dir, Seq("id"), Seq("id"))
    P.setTableProperties(dir, Map(
      "graft.maintain.keepVersions" -> "off",
      "graft.maintain.dvFoldPct" -> "off",
      "graft.maintain.smallFilesPerBucket" -> "off",
      "graft.maintain.bloomRebuildPct" -> "off"))
    val r1 = P.maintainAuto(spark, dir, Seq("id")).get
    assert(r1.vacuumed.isEmpty && r1.optimizedBuckets.isEmpty
      && r1.foldedDvVersion.isEmpty,
      s"all-off properties must make maintain a no-op: $r1")
    P.setTableProperties(dir, Map("graft.maintain.keepVersions" -> "2"))
    val r2 = P.maintainAuto(spark, dir, Seq("id")).get
    assert(r2.vacuumed.nonEmpty, s"keepVersions=2 via properties must vacuum: $r2")
  }
}
