package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import java.nio.file.Files

/** A54: secondary bloom-filter point-lookup index. Laws:
  *
  *  - correctness: readPoint ≡ full-scan + IN filter, for hit and
  *    miss probes, string and integral columns;
  *  - pruning: a selective probe reads a strict subset of buckets
  *    (inputFiles-asserted);
  *  - degradation: a deleted sidecar entry makes its bucket
  *    must-read — results never change;
  *  - maintenance: a delta publish drops rewritten buckets' entries
  *    (their bucket stays correct via must-read) and carries the
  *    rest; rebuild re-covers everything;
  *  - MoR interplay: rows deleted by a deletion vector never
  *    resurface through the bloom path.
  */
class BloomIndexSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft").toString

  private val B = 8
  // high-cardinality secondary column `tag`: unique per row, so a
  // point probe is genuinely selective
  private def fixture(n: Int) =
    spark.range(0, n).select(col("id"),
      concat(lit("tag-"), col("id") * 7919L).as("tag"),
      (col("id") * 13L).as("num"))

  private def lookup(dir: String, column: String, vs: Seq[Any]): Set[Long] =
    CdcPipeline.readPoint(spark, dir, column, vs).get
      .select("id").collect().map(_.getLong(0)).toSet

  test("readPoint equals scan+filter and prunes buckets; string and long columns") {
    val dir = tmp()
    CdcPipeline.publish(fixture(4000), dir, Seq("id"), buckets = Some(B))
    val v = CdcPipeline.buildBloomIndex(spark, dir, "tag",
      expectedPerBucket = 1000L).get
    assert(v === 1L)
    CdcPipeline.buildBloomIndex(spark, dir, "num", expectedPerBucket = 1000L).get

    // hits
    assert(lookup(dir, "tag", Seq("tag-0", "tag-7919", "tag-15838")) ===
      Set(0L, 1L, 2L))
    assert(lookup(dir, "num", Seq(13L * 777L)) === Set(777L))
    // misses (never inserted): empty, not an error
    assert(lookup(dir, "tag", Seq("tag-3")) === Set.empty)

    // pruning: the probe reads strictly fewer buckets than the store
    val full = CdcPipeline.readSnapshot(spark, dir).get.inputFiles.toSet
    val probed = CdcPipeline.readPoint(spark, dir, "tag", Seq("tag-7919")).get
      .inputFiles.toSet
    assert(probed.subsetOf(full) && probed.size < full.size,
      s"bloom probe must prune: ${probed.size} of ${full.size} files")
    // no index for a column: full honest scan, same answer
    val m = CdcPipeline.manifest(dir, CdcPipeline.currentVersion(dir).get).get
    assert(!m.meta.contains("bloom.id"))
    assert(lookup(dir, "id", Seq(5L)) === Set(5L))
  }

  test("missing sidecar entry degrades to must-read; results unchanged") {
    val dir = tmp()
    CdcPipeline.publish(fixture(2000), dir, Seq("id"), buckets = Some(B))
    val v = CdcPipeline.buildBloomIndex(spark, dir, "tag",
      expectedPerBucket = 1000L).get
    val expected = lookup(dir, "tag", Seq("tag-0", "tag-7919"))
    // tear one bucket's entry out
    val dirEnt = s"$dir/v$v/_bloom"
    val sub = StoreFs.listDirNames(dirEnt).head
    val one = StoreFs.listFilePaths(s"$dirEnt/$sub", ".bf").head
    StoreFs.deleteFile(one)
    assert(lookup(dir, "tag", Seq("tag-0", "tag-7919")) === expected)
  }

  test("delta publish drops rewritten buckets' entries, carries the rest") {
    val dir = tmp()
    CdcPipeline.publish(fixture(4000), dir, Seq("id"), buckets = Some(B))
    CdcPipeline.buildBloomIndex(spark, dir, "tag", expectedPerBucket = 1000L).get
    // rewrite bucket 2 with CHANGED tags — the stale filter would lie
    val m = CdcPipeline.manifest(dir, CdcPipeline.currentVersion(dir).get).get
    val b2 = CdcPipeline.readBuckets(spark, dir, m, Set(2))
      .withColumn("tag", concat(col("tag"), lit("-x")))
    val v = CdcPipeline.publishDelta(b2, dir, Seq("id"), m, Set(2), batchId = -1L)
    val m2 = CdcPipeline.manifest(dir, v).get
    assert(m2.meta.contains("bloom.tag"), "carried entries must survive")
    // bucket 2's entry is gone → must-read → the NEW tag is findable
    // and the OLD one is not, despite the stale-build-time filter
    val changed = CdcPipeline.readBuckets(spark, dir, m2, Set(2))
      .select("id", "tag").collect()
    val (someId, someTag) =
      (changed.head.getLong(0), changed.head.getString(1))
    assert(lookup(dir, "tag", Seq(someTag)) === Set(someId))
    assert(lookup(dir, "tag", Seq(someTag.stripSuffix("-x"))) === Set.empty)
    // rebuild re-covers every bucket: strict pruning again
    CdcPipeline.buildBloomIndex(spark, dir, "tag", expectedPerBucket = 1000L).get
    val full = CdcPipeline.readSnapshot(spark, dir).get.inputFiles.toSet
    val probed = CdcPipeline.readPoint(spark, dir, "tag", Seq(someTag)).get
      .inputFiles.toSet
    assert(probed.size < full.size)
  }

  test("deletion-vector rows never resurface through the bloom path") {
    val dir = tmp()
    CdcPipeline.publish(fixture(2000), dir, Seq("id"), buckets = Some(B))
    CdcPipeline.buildBloomIndex(spark, dir, "tag", expectedPerBucket = 1000L).get
    CdcPipeline.deleteWhereMoR(spark, dir, Seq("id"), col("id") < 100).get
    // the filter still "contains" tag-0 (blooms are supersets) but
    // the DV anti-join on the read removes the row
    assert(lookup(dir, "tag", Seq("tag-0")) === Set.empty)
    assert(lookup(dir, "tag", Seq("tag-" + 7919L * 150L)) === Set(150L))
    val m = CdcPipeline.manifest(dir, CdcPipeline.currentVersion(dir).get).get
    assert(m.meta.contains("bloom.tag"), "MoR delete must carry the index")
  }
}
