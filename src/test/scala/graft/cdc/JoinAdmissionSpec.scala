package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** A90 cost-based join admission (r9 verdict #3): the physical plan
  * of store-backed joins must FLIP with store metadata — broadcast
  * under the footer-bytes ceiling, shuffled-hash above it, never
  * sort-merge — across readJoin, readKeysFromStore,
  * JoinView.dimFromStore, and MergeInto.sourceRows.
  */
class JoinAdmissionSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-adm-$tag").toString

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("admitJoin: footer totals, side pick, and the byte-ceiling flip") {
    val a = tmp("a"); val b = tmp("b")
    CdcPipeline.publish(spark.range(0, 5000).select(col("id"),
      (col("id") % 100).as("g")), a, Seq("id"), buckets = Some(4))
    CdcPipeline.publish(spark.range(0, 200).select(col("id"),
      concat(lit("n"), col("id")).as("name")), b, Seq("id"), buckets = Some(4))
    val adm = CdcPipeline.admitJoin(spark, a, b, "id").get
    assert(adm.rowsA === 5000L && adm.rowsB === 200L)
    assert(adm.bytesA > 0 && adm.bytesB > 0)
    assert(adm.broadcastSide === Some("b"), "the smaller side broadcasts")
    // no NDV index on either side: the estimate is honestly absent,
    // and the bytes decision stands regardless
    assert(adm.estimate.isEmpty)
    // ceiling below both sides: nothing is broadcast-admissible
    assert(CdcPipeline.admitJoin(spark, a, b, "id", maxBytes = 1L)
      .get.broadcastSide === None)
    StoreFs.deleteRecursive(a); StoreFs.deleteRecursive(b)
  }

  test("readJoin: plan flips broadcast → shuffled-hash with the ceiling") {
    val a = tmp("ra"); val b = tmp("rb")
    CdcPipeline.publish(spark.range(0, 3000).select(col("id"),
      (col("id") * 7).as("v")), a, Seq("id"), buckets = Some(4))
    CdcPipeline.publish(spark.range(0, 100).select(col("id"),
      concat(lit("d"), col("id")).as("dim")), b, Seq("id"), buckets = Some(4))
    val bc = CdcPipeline.readJoin(spark, a, b, "id").get
    val pBc = physical(bc)
    assert(pBc.contains("BroadcastHashJoin"), pBc)
    assert(bc.count() === 100L)
    val sh = CdcPipeline.readJoin(spark, a, b, "id", maxBytes = 1L).get
    val pSh = physical(sh)
    assert(pSh.contains("ShuffledHashJoin"), pSh)
    assert(!pSh.contains("SortMergeJoin"), s"never sort-merge: $pSh")
    assert(sh.count() === 100L)
    StoreFs.deleteRecursive(a); StoreFs.deleteRecursive(b)
  }

  test("graft_join TVF routes through the admitted plan") {
    graft.GraftExtensions.register(spark)
    val a = tmp("ta"); val b = tmp("tb")
    CdcPipeline.publish(spark.range(0, 500).select(col("id"),
      (col("id") * 2).as("v")), a, Seq("id"), buckets = Some(4))
    CdcPipeline.publish(spark.range(0, 50).select(col("id"),
      lit("x").as("tag")), b, Seq("id"), buckets = Some(4))
    val got = spark.sql(s"SELECT count(*) AS n FROM graft_join('$a', '$b', 'id')")
      .collect()(0).getLong(0)
    assert(got === 50L)
    StoreFs.deleteRecursive(a); StoreFs.deleteRecursive(b)
  }

  test("readKeysFromStore: pruned broadcast path small, shuffled-hash big") {
    val t = tmp("kt"); val k = tmp("kk")
    CdcPipeline.publish(spark.range(0, 4000).select(col("id"),
      (col("id") % 13).as("v")), t, Seq("id"), buckets = Some(8))
    CdcPipeline.publish(spark.range(100, 140).toDF("id"), k, Seq("id"),
      buckets = Some(2))
    val small = CdcPipeline.readKeysFromStore(spark, t, Seq("id"), k).get
    assert(physical(small).contains("BroadcastHashJoin"), physical(small))
    assert(small.count() === 40L)
    // same key store, ceiling forced to 1 byte: the full-snapshot
    // shuffled-hash semi join (no driver bucket collect, no broadcast)
    val big = CdcPipeline.readKeysFromStore(spark, t, Seq("id"), k, maxBytes = 1L).get
    val pBig = physical(big)
    assert(pBig.contains("ShuffledHashJoin"), pBig)
    assert(!pBig.contains("SortMergeJoin"), pBig)
    assert(big.count() === 40L)
    StoreFs.deleteRecursive(t); StoreFs.deleteRecursive(k)
  }

  test("JoinView.dimFromStore: admission hint rides through enrich") {
    val dimDir = tmp("dim")
    CdcPipeline.publish(spark.range(0, 60).select(col("id").as("ck"),
      concat(lit("c"), col("id")).as("cname")), dimDir, Seq("ck"), buckets = Some(2))
    val fact = spark.range(0, 1000).select(col("id"),
      (col("id") % 60).as("ck"), (col("id") * 3).as("amt"))
    val spec = JoinView.JoinViewSpec(tmp("view"), Seq("id"), "ck", "ck",
      Seq("cname"), numBuckets = 4)
    val dimBc = JoinView.dimFromStore(spark, dimDir).get
    val joined = fact.join(dimBc.select(col("ck"), col("cname")), Seq("ck"), "left")
    assert(physical(joined).contains("BroadcastHashJoin"), physical(joined))
    val dimSh = JoinView.dimFromStore(spark, dimDir, maxBytes = 1L).get
    val joinedSh = fact.join(dimSh.select(col("ck"), col("cname")), Seq("ck"), "left")
    val pSh = physical(joinedSh)
    assert(pSh.contains("ShuffledHashJoin") && !pSh.contains("SortMergeJoin"), pSh)
    StoreFs.deleteRecursive(dimDir); StoreFs.deleteRecursive(spec.viewDir)
  }

  test("MergeInto.sourceRows: declared size picks the join strategy") {
    val target = spark.range(0, 2000).select(col("id"), (col("id") * 5).as("v"))
    val source = spark.range(0, 50).select(col("id"), (col("id") * 9).as("v"))
    def mi = MergeInto(target, source, Seq("id"))
      .skipDuplicateSourceCheck()
      .whenMatchedUpdateAll()
    val small = mi.sourceRows(50L).run()
    assert(physical(small).contains("BroadcastHashJoin"), physical(small))
    val big = mi.sourceRows(MergeInto.BroadcastSourceRows + 1).run()
    val pBig = physical(big)
    assert(pBig.contains("ShuffledHashJoin") && !pBig.contains("SortMergeJoin"), pBig)
    // results identical either way
    assert(small.orderBy("id").collect().toSeq ===
      big.orderBy("id").collect().toSeq)
  }
}
