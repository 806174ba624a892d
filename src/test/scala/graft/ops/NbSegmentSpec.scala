package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** C134 (exact integer Naive Bayes) and C135 (segment-level language
  * routing) laws — the synthetic-fixture side of the oracle gates
  * `corpus_nb_classifier` / `corpus_nb_filtered` /
  * `text_segment_langid`.
  */
class NbSegmentSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("NB recovers a planted vocabulary split; weights clamp; prior is exact") {
    // class-1 docs speak {alpha..delta}, class-0 docs {omega..psi} —
    // fully separable, so the fitted classifier must agree with the
    // labels on every doc
    val docs = ((0L until 30L).map(i =>
        (i, "alpha beta gamma delta alpha beta")) ++
      (30L until 40L).map(i => (i, "omega psi chi omega psi chi")))
      .toDF("doc_id", "text")
    val labels = (0L until 40L).map(i => (i, i < 30L)).toDF("doc_id", "label")
    val out = CorpusStats.naiveBayesScores(docs, labels).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 40)
    (0L until 40L).foreach { i =>
      assert(out(i).getAs[Boolean]("nb_keep") === (i < 30L),
        s"doc $i misclassified")
      assert(out(i).getAs[Long]("n_toks") === 6L)
    }
    // prior: nd1=30, nd=40 → (31·10⁶ div 42) − (11·10⁶ div 42)
    val prior = out(0L).getAs[Long]("prior_ppm")
    assert(prior === 31L * 1000000L / 42L - 11L * 1000000L / 42L)
    // evidence is the exact pinned arithmetic: re-derive the per-token
    // weights with the same two-step floors and compare bit-for-bit
    def w(c1: Long, c0: Long, t1: Long, t0: Long, v: Long): Long = {
      val p1 = (c1 + 1) * 1000000000L / (t1 + v)
      val p0 = (c0 + 1) * 1000000000L / (t0 + v)
      math.min(math.max(p1 * 1000000L / p0, 15625L), 64000000L) - 1000000L
    }
    // class-1 corpus: alpha 60, beta 60, gamma 30, delta 30 (T1=180);
    // class-0: omega/psi/chi 20 each (T0=60); V=7
    // doc 0 = alpha×2 beta×2 gamma×1 delta×1
    val ev1 = out(0L).getAs[Long]("evidence_ppm")
    assert(ev1 === 4 * w(60, 0, 180, 60, 7) + 2 * w(30, 0, 180, 60, 7))
    val ev0 = out(30L).getAs[Long]("evidence_ppm")
    assert(ev0 === 6 * w(0, 20, 180, 60, 7))
  }

  test("NB weight clamp binds on extreme class-exclusive ratios") {
    // 'rare' appears 100× in class 1 only; class 0 is one 200-token
    // doc — raw ratio ≈ 101·202/102 ≈ 200 > 64, so the weight clamps
    // at +63·10⁶ and a one-token class-1 doc scores exactly that
    val docs = ((0L until 100L).map(i => (i, "rare")) :+
      (100L, Seq.fill(200)("other").mkString(" "))).toDF("doc_id", "text")
    val labels = (0L until 101L).map(i => (i, i < 100L)).toDF("doc_id", "label")
    val out = CorpusStats.naiveBayesScores(docs, labels).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("evidence_ppm") === 63000000L)
    assert(out(0L).getAs[Boolean]("nb_keep"))
    assert(!out(100L).getAs[Boolean]("nb_keep"))
  }

  test("held-out NB: unseen tokens take the exact Laplace-floor weight") {
    // same planted separable corpus as the first test (T1=180, T0=60,
    // V=7); score DISJOINT docs whose tokens mix in-vocab and unseen
    val train = ((0L until 30L).map(i =>
        (i, "alpha beta gamma delta alpha beta")) ++
      (30L until 40L).map(i => (i, "omega psi chi omega psi chi")))
      .toDF("doc_id", "text")
    val labels = (0L until 40L).map(i => (i, i < 30L)).toDF("doc_id", "label")
    val score = Seq(
      (100L, "alpha beta zzznew"),
      (101L, "zzznew zzzother")).toDF("doc_id", "text")
    val out = CorpusStats.naiveBayesScoresHoldout(train, labels, score)
      .collect().map(r => r.getLong(0) -> r).toMap
    def w(c1: Long, c0: Long, t1: Long, t0: Long, v: Long): Long = {
      val p1 = (c1 + 1) * 1000000000L / (t1 + v)
      val p0 = (c0 + 1) * 1000000000L / (t0 + v)
      math.min(math.max(p1 * 1000000L / p0, 15625L), 64000000L) - 1000000L
    }
    val floor = w(0, 0, 180, 60, 7) // the c=0 weight: (10⁹/187)·10⁶/(10⁹/67) − 10⁶
    assert(floor < 0L) // smaller class-0 corpus → unseen leans negative
    assert(out(100L).getAs[Long]("n_toks") === 3L)
    assert(out(100L).getAs[Long]("n_unseen") === 1L)
    assert(out(100L).getAs[Long]("evidence_ppm") ===
      w(60, 0, 180, 60, 7) * 2 + floor)
    assert(out(100L).getAs[Boolean]("nb_keep")) // in-vocab evidence dominates
    assert(out(101L).getAs[Long]("n_unseen") === 2L)
    assert(out(101L).getAs[Long]("evidence_ppm") === 2 * floor)
    assert(!out(101L).getAs[Boolean]("nb_keep")) // all-OOV doc drops
  }

  test("held-out NB degenerates to self-scoring on the training docs") {
    // left-join + floor must be a strict generalization: scoring the
    // TRAINING corpus through the holdout path reproduces
    // naiveBayesScores' evidence exactly, with zero unseen tokens
    val docs = ((0L until 20L).map(i => (i, "alpha beta alpha")) ++
      (20L until 30L).map(i => (i, "omega psi omega")))
      .toDF("doc_id", "text")
    val labels = (0L until 30L).map(i => (i, i < 20L)).toDF("doc_id", "label")
    val self = CorpusStats.naiveBayesScores(docs, labels).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ho = CorpusStats.naiveBayesScoresHoldout(docs, labels, docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(ho.size === self.size)
    ho.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_unseen") === 0L)
      assert(r.getAs[Long]("n_toks") === self(id).getAs[Long]("n_toks"))
      assert(r.getAs[Long]("evidence_ppm") ===
        self(id).getAs[Long]("evidence_ppm"))
      assert(r.getAs[Boolean]("nb_keep") ===
        self(id).getAs[Boolean]("nb_keep"))
    }
  }

  test("NB prototyped-difference regression: shared filler does not flip the split") {
    // shared high-frequency filler in BOTH classes — the failure mode
    // that sank the additive difference form; the ratio weights keep
    // filler near 0 and still separate on the exclusive markers
    val docs = ((0L until 20L).map(i =>
        (i, "the the the the the the alpha")) ++
      (20L until 30L).map(i => (i, "the the the the the the omega")))
      .toDF("doc_id", "text")
    val labels = (0L until 30L).map(i => (i, i < 20L)).toDF("doc_id", "label")
    val out = CorpusStats.naiveBayesScores(docs, labels).collect()
    assert(out.length === 30)
    out.foreach { r =>
      assert(r.getAs[Boolean]("nb_keep") === (r.getLong(0) < 20L),
        s"doc ${r.getLong(0)} misclassified with shared filler")
    }
  }

  test("k-fold scoring: each fold's scores equal the holdout path trained on the other folds") {
    // C137 law: the one-pass fold-keyed job must be exactly k
    // independent holdout runs — train on the other folds, score the
    // fold — fold by fold, bit for bit
    val docs = ((0L until 30L).map(i =>
        (i, "alpha beta gamma delta alpha beta")) ++
      (30L until 45L).map(i => (i, "omega psi chi omega psi chi")))
      .toDF("doc_id", "text")
    val labels = (0L until 45L).map(i => (i, i < 30L)).toDF("doc_id", "label")
    val k = 3
    val kf = CorpusStats.naiveBayesKfoldScores(docs, labels, k,
        col("doc_id") % k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(kf.size === 45)
    (0 until k).foreach { f =>
      val ho = CorpusStats.naiveBayesScoresHoldout(
          docs.filter(col("doc_id") % k =!= f), labels,
          docs.filter(col("doc_id") % k === f))
        .collect().map(r => r.getLong(0) -> r).toMap
      ho.foreach { case (id, r) =>
        val kr = kf((id, f.toLong))
        assert(kr.getAs[Long]("n_toks") === r.getAs[Long]("n_toks"))
        assert(kr.getAs[Long]("n_unseen") === r.getAs[Long]("n_unseen"))
        assert(kr.getAs[Long]("evidence_ppm") ===
          r.getAs[Long]("evidence_ppm"), s"fold $f doc $id")
        assert(kr.getAs[Boolean]("nb_keep") === r.getAs[Boolean]("nb_keep"))
      }
    }
  }

  test("conformal threshold: exact rank selection, ties, and the small-n keep-all degeneracy") {
    // 100 calibration scores 1..100, α=0.1 → k = ⌈0.9·101⌉ = 91 →
    // threshold = the 91st smallest = 91
    val cal = (1L to 100L).map(i => (i, i)).toDF("doc_id", "s")
    val (thr, n, kr) = CorpusStats.conformalThreshold(cal, 100000L)
    assert(n === 100L && kr === 91L)
    assert(thr.collect().map(_.getLong(0)).toSeq === Seq(91L))
    // ties: all s equal → threshold is that value (rank picks by
    // doc_id tie-break but the VALUE is what gates)
    val tied = (1L to 20L).map(i => (i, 7L)).toDF("doc_id", "s")
    val (thr2, n2, kr2) = CorpusStats.conformalThreshold(tied, 100000L)
    assert(n2 === 20L && kr2 === 19L)
    assert(thr2.collect().map(_.getLong(0)).toSeq === Seq(7L))
    // small n: 5 rows → k = ⌈0.9·6⌉ = 6 > 5 → +∞ (keep everything)
    val tiny = (1L to 5L).map(i => (i, i)).toDF("doc_id", "s")
    val (thr3, n3, kr3) = CorpusStats.conformalThreshold(tiny, 100000L)
    assert(n3 === 5L && kr3 === 6L)
    assert(thr3.collect().map(_.getLong(0)).toSeq === Seq(Long.MaxValue))
  }

  test("streaming NB scoring: micro-batched scoring over a fitted model matches the batch path") {
    // C140: fit once (the persisted-model shape), score a stream of
    // new docs per micro-batch through the shared nbScore tail — the
    // classifier in the ingestion path. Batch/stream equivalence is
    // exact because each doc's tokens live in one micro-batch.
    implicit val sq = spark.sqlContext
    val train = ((0L until 30L).map(i =>
        (i, "alpha beta gamma delta alpha beta")) ++
      (30L until 40L).map(i => (i, "omega psi chi omega psi chi")))
      .toDF("doc_id", "text")
    val labels = (0L until 40L).map(i => (i, i < 30L)).toDF("doc_id", "label")
    val (w, wu) = CorpusStats.nbFit(train, labels)
    val newDocs = Seq(
      (100L, "alpha beta zzznew"), (101L, "zzznew zzzother"),
      (102L, "omega psi chi"), (103L, "alpha alpha beta"))
    val expected = CorpusStats.nbScore(newDocs.toDF("doc_id", "text"), w, wu)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[Any]]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        CorpusStats.nbScore(b, w, wu).collect().foreach(r =>
          got.synchronized { got(r.getLong(0)) = r.toSeq })
      }
      .start()
    try {
      mem.addData(newDocs.take(2): _*); q.processAllAvailable()
      mem.addData(newDocs.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size === 4)
    expected.foreach { case (id, row) =>
      assert(got(id) === row, s"doc $id stream/batch divergence")
    }
  }

  test("segment routing: code-switched doc splits into per-language runs that tile the doc") {
    val en = "the cat and a dog of the house is to go in the yard is a "
    val de = "der hund und die katze das ist nicht der fall und das ist der hund und "
    // 32 en tokens then 32 de tokens → halves disagree → flagged;
    // 16-token windows give 2 en runs then 2 de runs → 2 segments
    val text = (en.trim.split(" ").take(16) ++ en.trim.split(" ").take(16) ++
      de.trim.split(" ").take(16) ++ de.trim.split(" ").take(16)).mkString(" ")
    val docs = Seq((1L, text), (2L, en.trim + " " + en.trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_seg").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val segs = OpsQueries.textSegmentLangid(spark, dir).collect()
    // doc 2 is consistent en/en → not flagged, absent
    assert(!segs.exists(_.getLong(0) == 2L))
    val d1 = segs.filter(_.getLong(0) == 1L)
    assert(d1.length === 2, s"expected 2 segments, got ${d1.toSeq}")
    assert(d1.map(_.getAs[String]("lang")).toSeq === Seq("en", "de"))
    assert(d1.map(_.getAs[Long]("n_tokens")).sum === 64L)
    assert(d1.map(_.getAs[Long]("n_windows")).toSeq === Seq(2L, 2L))
    // segments tile the doc: concatenated seg_text = lowercased text
    assert(d1.sortBy(_.getAs[Long]("seg_idx"))
      .map(_.getAs[String]("seg_text")).mkString(" ") === text.toLowerCase)
    graft.cdc.StoreFs.deleteRecursive(dir)
  }
}
