package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{LocalSpark, Tables => T}

/** C12: multimodal binary-column plumbing with the stubbed decode. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("media wrap + feature extraction: schema, counts, determinism") {
    val docs = T.documents(spark, LocalSpark.sf)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "bytes", "width", "height"))

    val feats = Multimodal.extractFeatures(media, dim = 8)
    assert(feats.schema === Multimodal.featureSchema)
    assert(feats.count() === docs.count())

    // deterministic across runs
    val a = feats.orderBy("media_id").limit(5).collect().map(_.toSeq).toSeq
    val b = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").limit(5).collect().map(_.toSeq).toSeq
    assert(a === b)

    // features bounded in [0,1); n_bytes equals payload length
    val bad = feats.select(explode(col("features")).as("f"))
      .filter(col("f") < 0 || col("f") >= 1).count()
    assert(bad === 0L)
  }

  test("decodeStub matches a hand computation") {
    val f = Multimodal.decodeStub(Array[Byte](0, 64, -128, 64), 2)
    // dim 0: bytes 0,128 → mean 64 → .25 ; dim 1: bytes 64,64 → 64 → .25
    assert(f.toSeq === Seq(0.25f, 0.25f))
  }
}
