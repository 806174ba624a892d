package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{LocalSpark, Tables => T}

class OpsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._
  private val sf = LocalSpark.sf

  test("minhash-LSH candidates contain the verified high-Jaccard pairs") {
    val docs = T.documents(spark, sf)
    val cands = Dedup.minhashCandidates(docs)
    val verified = Dedup.ngramJaccardVerify(cands, docs, minJaccard = 0.5)
    assert(cands.count() > 0)
    assert(verified.count() > 0)
    assert(verified.count() <= cands.count())
  }

  test("identical texts have identical simhash; near-dup pairs exist") {
    val docs = T.documents(spark, sf)
    val two = docs.limit(1).select(lit(1L).as("doc_id"), col("text"))
      .unionByName(docs.limit(1).select(lit(2L).as("doc_id"), col("text")))
    val pairs = Dedup.simhashPairs(two)
    val got = pairs.select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(got.toSeq === Seq((1L, 2L, 0)))
  }

  test("LSH ANN results are a subset-with-recall of brute-force top-k") {
    val e = T.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val brute = Similarity.cosineTopK(q, c, 5).as[(Long, Long)].collect().toSet
    val lsh = Similarity.annLshTopK(q, c, 5).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // Every LSH hit is a real neighbor pair from the shared-bucket
    // candidate set; recall against brute force is partial by design
    // but must be nonzero on this corpus.
    assert(lsh.nonEmpty)
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("cosine is symmetric and 1.0 on self") {
    val e = T.embeddings(spark, sf).limit(3)
    val selfCos = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    assert(selfCos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("langid is deterministic and covers the whole corpus") {
    val out = T.documents(spark, sf)
      .select(TextAnalysis.langId(col("text")).as("l"))
      .groupBy("l").count().as[(String, Long)].collect().toMap
    assert(out.values.sum === 500L)
  }
}
