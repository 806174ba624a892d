package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{LocalSpark, Tables => T}

class OpsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._
  private val sf = LocalSpark.sf

  test("minhash-LSH candidates contain 100% of the true J>=0.5 pairs") {
    val docs = T.documents(spark, sf)
    val cands = Dedup.minhashCandidates(docs).as[(Long, Long)].collect().toSet
    // Exact all-pairs ground truth (no LSH prefilter).
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val truth = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
        / size(array_union(col("sh_a"), col("sh_b"))) >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val missed = truth -- cands
    assert(missed.isEmpty, s"LSH missed ${missed.size} true pairs: ${missed.take(5)}")
  }

  test("incremental minhash ingestion equals the one-shot candidate set across 3 batches") {
    val docs = T.documents(spark, sf)
    val oneShot = Dedup.minhashCandidates(docs).as[(Long, Long)].collect().toSet
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.as[(Long, Long)].collect().toSet
    val empty = Dedup.minhashEntries(docs.limit(0))
    val (p1, e1) = Dedup.incrementalMinhash(docs.filter(col("doc_id") % 3 === 0), empty)
    val i1 = e1.localCheckpoint(true)
    val (p2, e2) = Dedup.incrementalMinhash(docs.filter(col("doc_id") % 3 === 1), i1)
    val i2 = i1.unionByName(e2).localCheckpoint(true)
    val (p3, e3) = Dedup.incrementalMinhash(docs.filter(col("doc_id") % 3 === 2), i2)
    val got = pairs(p1) ++ pairs(p2) ++ pairs(p3)
    assert(got === oneShot,
      s"incremental=${got.size} oneshot=${oneShot.size} " +
        s"missed=${(oneShot -- got).take(3)} extra=${(got -- oneShot).take(3)}")
    assert(pairs(p2).nonEmpty || pairs(p3).nonEmpty, "cross-batch pairs must exist")
    // the final index holds every posting exactly once
    assert(i2.unionByName(e3).count() === Dedup.minhashEntries(docs).count())
  }

  test("simhash LSH pairs equal the exact all-pairs Hamming<=3 truth") {
    // 4 bands × 16 bits give GUARANTEED recall for Hamming ≤ 3: three
    // flipped bits can touch at most 3 bands, so one band always
    // collides (pigeonhole) — so the banded output must EQUAL the
    // brute-force all-pairs result, not just approximate it (modulo
    // the oversized-bucket guard, which this corpus doesn't trip).
    val docs = T.documents(spark, sf)
    val lsh = Dedup.simhashPairs(docs).select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))
    val truth = sh.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("sim").as("sim_b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(lsh === truth, s"banded=${lsh.size} truth=${truth.size}")
  }

  test("identical texts have identical simhash; near-dup pairs exist") {
    val docs = T.documents(spark, sf)
    val two = docs.limit(1).select(lit(1L).as("doc_id"), col("text"))
      .unionByName(docs.limit(1).select(lit(2L).as("doc_id"), col("text")))
    val pairs = Dedup.simhashPairs(two)
    val got = pairs.select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(got.toSeq === Seq((1L, 2L, 0)))
  }

  test("embedding LSH near-dup equals the exact all-pairs result") {
    val e = T.embeddings(spark, sf)
    val truth = Similarity.cosinePairs(e, 0.42).as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosinePairsLsh(e, 0.42).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(lsh === truth,
      s"lsh=${lsh.size} truth=${truth.size} missed=${(truth -- lsh).size}")
  }

  test("auto LSH params: occupancy-pinned planes, recall-driven tables, auto path exact at gate scale") {
    // gate-scale corpora resolve into the planes=4 regime the τ=0.42
    // oracle was tuned on, with tables ≥ the old fixed 24 (recall can
    // only improve — the gate swap to the auto path is sound)
    val (t200, p200) = Similarity.lshAutoParams(200L, 0.42)
    assert(p200 === 4 && t200 >= 24, s"($t200, $p200)")
    // planes grow logarithmically with N (occupancy stays ~64):
    // candidates per table stay ∝ N·occupancy instead of N²/2⁴
    val (t20k, p20k) = Similarity.lshAutoParams(20000L, 0.42)
    assert(p20k === 9, s"planes at 20k: $p20k")
    assert(t20k > t200, "the recall tax lands in tables, never silently in recall")
    // declared-recall math: 1 − (1 − p^planes)^tables ≥ target (up to
    // the table cap), p = 1 − acos(τ)/π
    val p = 1.0 - math.acos(0.42) / math.Pi
    val recall = 1.0 - math.pow(1.0 - math.pow(p, p20k.toDouble), t20k.toDouble)
    assert(recall >= 0.98, s"recall bound $recall")
    // easier τ needs far fewer tables at the same occupancy
    val (t08, _) = Similarity.lshAutoParams(20000L, 0.8)
    assert(t08 < t20k / 2, s"τ=0.8 tables $t08 vs τ=0.42 $t20k")
    // the auto path reproduces the exact all-pairs set on the corpus
    val e = T.embeddings(spark, sf)
    val truth = Similarity.cosinePairs(e, 0.42).as[(Long, Long)].collect().toSet
    val auto = Similarity.cosinePairsLshAuto(e, 0.42).as[(Long, Long)].collect().toSet
    assert(auto === truth, s"auto=${auto.size} truth=${truth.size}")
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

  test("LSH bucket guard drops degenerate buckets instead of expanding them") {
    // 50 identical vectors collapse onto ONE bucket in every table —
    // the pathological shape that expands B² pairs on a single task
    val clones = (0 until 50).map(i => (i.toLong, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.cosinePairsLsh(clones, 0.9, tables = 2, planes = 4,
      maxBucket = 10).count() === 0L, "oversized buckets must be dropped, not expanded")
    assert(Similarity.cosinePairsLsh(clones, 0.9, tables = 2, planes = 4,
      maxBucket = 100).count() === 50L * 49 / 2)
    val q = Seq((1000L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.annLshTopK(q, clones, 5, tables = 2, planes = 4,
      maxBucket = 10).count() === 0L)
    assert(Similarity.annLshTopK(q, clones, 5, tables = 2, planes = 4,
      maxBucket = 100).count() === 5L)
  }

  test("cosineTopK drops the query-side broadcast hint above the batch-size gate") {
    val e = T.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    def hasHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    val hinted = Similarity.cosineTopK(q, c, 5)
    val large = Similarity.cosineTopK(q, c, 5,
      queryRows = Some(Similarity.BroadcastQueryRows + 1))
    assert(hasHint(hinted), "small/unknown batch keeps the broadcast hint")
    assert(!hasHint(large), "large known batch must not force a broadcast")
    // queryRows is a physical hint ONLY: without the explicit approx
    // opt-in the large-batch result stays exact (ADVICE r5 — a plan
    // hint must never silently change semantics).
    assert(large.as[(Long, Long)].collect().toSet ===
      hinted.as[(Long, Long)].collect().toSet)
    // The explicit approx opt-in routes through the bucketed LSH
    // join: the plan must contain NO cartesian of any kind — both
    // sides key on (tbl, bucket) and co-partition.
    val approx = Similarity.cosineTopK(q, c, 5,
      queryRows = Some(Similarity.BroadcastQueryRows + 1), approx = true)
    val phys = approx.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"),
      phys.linesIterator.take(30).mkString("\n"))
    // Deep-table equality at small SF: the routed result must equal
    // brute force on this corpus (recall is spec-checked, not assumed).
    assert(approx.as[(Long, Long)].collect().toSet ===
      hinted.as[(Long, Long)].collect().toSet)
  }

  test("minhashCandidates with explicit MinHashLsh params matches the defaults") {
    val docs = T.documents(spark, sf)
    val byDefault = Dedup.minhashCandidates(docs).as[(Long, Long)].collect().toSet
    val explicit = Dedup.minhashCandidates(docs, col("text"),
      Dedup.MinHashLsh(bands = 8, rowsPerBand = 2, maxBucket = 100))
      .as[(Long, Long)].collect().toSet
    assert(explicit === byDefault)
  }

  test("IVF ANN: exact when probing all lists; probe-limited recall reported") {
    val e = T.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    // fixed-M centroid sample — same contract as the driver gate
    // (centroid count must not grow with the corpus)
    val cent = e.filter(col("vec_id") >= 10 && col("vec_id") < 42)
    val m = cent.count().toInt
    val brute = Similarity.cosineTopK(q, c, 5).as[(Long, Long)].collect().toSet
    // nprobe = M searches every inverted list → must equal brute force.
    val full = Similarity.annIvfTopK(q, c, cent, 5, m).as[(Long, Long)].collect().toSet
    assert(full === brute)
    // probe-limited: subset search; recall is the honest quality number
    // (this corpus is unclustered noise, so expect ~nprobe/M).
    val limited = Similarity.annIvfTopK(q, c, cent, 5, 4).as[(Long, Long)].collect().toSet
    val recall = brute.intersect(limited).size.toDouble / brute.size
    assert(recall > 0.0 && limited.size <= brute.size * 5)
    info(f"ivf nprobe=4/M=$m recall=$recall%.2f")
  }

  test("PQ ANN: valid compact codes, deterministic encode, ADC recall vs brute force") {
    val e = T.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val model = Pq.fitDf(c.orderBy(col("vec_id")), m = 16, k = 64, iters = 10)
    val enc = Pq.encode(c, model)
    // every code addresses a real centroid; norms are positive
    val bad = enc.select(explode(col("codes")).as("cd"))
      .filter(col("cd") < 0 || col("cd") >= 64).count()
    assert(bad === 0L)
    assert(enc.filter(col("recon_norm") <= 0).count() === 0L)
    assert(enc.select(size(col("codes"))).distinct().as[Int].collect().toSeq === Seq(16),
      "64 dims → 16 codes per vector (16× compression vs float32)")
    // encode is deterministic (train/executor kernels agree)
    val enc2 = Pq.encode(c, model).select("vec_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(enc.select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap === enc2)
    // recall against the exact scan — the honest quality number
    val brute = Similarity.cosineTopK(q, c, 5).as[(Long, Long)].collect().toSet
    val pq = Pq.adcTopK(q, enc, model, 5).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    info(f"pq m=16 k=64 adc-only recall=$recall%.2f")
    assert(recall > 0.25, s"adc recall=$recall")
    // two-stage (ADC shortlist → exact rerank): the production shape;
    // refine=4 must buy most of the quantization error back
    val reranked = Pq.adcTopKRerank(q, enc, c, model, 5, refine = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rerankRecall = brute.intersect(reranked).size.toDouble / brute.size
    info(f"pq reranked refine=4 recall=$rerankRecall%.2f")
    assert(rerankRecall > 0.7, s"reranked recall=$rerankRecall")
    assert(rerankRecall >= recall, "rerank must never hurt recall")
  }

  test("IVF×PQ: recall >= plain IVF at equal probe budget; ADC-scored rows are probed lists only") {
    val e = T.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val cent = e.filter(col("vec_id") >= 10 && col("vec_id") < 42)
    val model = Pq.fitDf(c.orderBy(col("vec_id")), m = 16, k = 64, iters = 10)
    val index = Pq.ivfPqIndex(c, cent, model)
    assert(index.count() === c.count(), "every corpus vector lands in exactly one list")
    assert(index.select(size(col("codes"))).distinct().as[Int].collect().toSeq === Seq(16),
      "the index stores 16-byte-ish codes, not floats")

    val brute = Similarity.cosineTopK(q, c, 5).as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvfTopK(q, c, cent, 5, 4).as[(Long, Long)].collect().toSet
    val ivfpq = Pq.ivfPqTopK(q, index, c, cent, model, topK = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rIvf = brute.intersect(ivf).size.toDouble / brute.size
    val rIvfPq = brute.intersect(ivfpq).size.toDouble / brute.size
    info(f"ivf recall=$rIvf%.2f  ivf-pq recall=$rIvfPq%.2f (nprobe=4, refine=4)")
    assert(rIvfPq >= rIvf,
      s"exact rerank over the same probed lists must not lose recall: $rIvfPq < $rIvf")

    // probe-limit semantics: every result comes from a probed list,
    // and the ADC stage's input is the probed lists' rows — a fixed
    // nprobe/M fraction of the corpus, not the corpus
    val probes = Pq.probeSet(q, cent, 4)
    val probedPairs = probes.join(index, "cid")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.subsetOf(probedPairs), "results must come only from probed lists")
    val scoredRows = probedPairs.size.toLong
    val bruteRows = q.count() * c.count()
    assert(scoredRows <= bruteRows / 4,
      s"ADC must score probed lists (~nprobe/M of the corpus), got $scoredRows of $bruteRows")
  }

  test("k-means fit recovers planted clusters and lifts IVF recall over id-sample centroids") {
    import org.apache.spark.sql.functions.broadcast
    val rnd = new scala.util.Random(42)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    def noisy(c: Array[Float]): Array[Float] =
      c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f)
    // classes live in ID BLOCKS (0-29, 30-59, 60-89), so the naive
    // id-sample quantizer (lowest ids) picks 3 centroids from the
    // SAME cluster — the regime where training matters
    val corpusPts = (0 until 90).map(i => (i.toLong, noisy(centers(i / 30))))
    val queryPts = (0 until 6).map(i => ((1000 + i).toLong, noisy(centers(i % 3))))
    val corpus = corpusPts.toDF("vec_id", "embedding")
    val queries = queryPts.toDF("vec_id", "embedding")

    val trained = Similarity.kmeansFit(corpus, 3, 5)
    assert(trained.count() === 3)

    // trained centroids induce exactly the planted partition
    val cents = trained.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val byClass = corpusPts.groupBy(_._1 / 30).map { case (cls, pts) =>
      cls -> pts.map(p => cents.maxBy(c => cos(c._2, p._2))._1).toSet
    }
    assert(byClass.values.forall(_.size === 1), s"each planted class maps to one centroid: $byClass")
    assert(byClass.values.flatten.toSet.size === 3, "distinct classes get distinct centroids")

    // recall at nprobe=1: trained quantizer must beat the id-sample
    val brute = Similarity.cosineTopK(queries, corpus, 5)
      .as[(Long, Long)].collect().toSet
    val idSample = corpus.orderBy(col("vec_id")).limit(3)
    def recall(cent: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.annIvfTopK(queries, corpus, cent, 5, 1)
        .as[(Long, Long)].collect().toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val rTrained = recall(trained); val rId = recall(idSample)
    info(f"ivf recall nprobe=1: kmeans=$rTrained%.2f id-sample=$rId%.2f")
    assert(rTrained >= 0.9, s"trained recall $rTrained")
    assert(rTrained > rId, s"training must lift recall: $rTrained vs $rId")
  }

  test("connected components: chains collapse, components stay separate") {
    // 1-2-3-4 chain (diameter 3) + separate pair 10-11 + triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // default gate resolves this driver-side (union-find)…
    val got = Clusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === expect)
    // …and collectEdges = 0 forces the distributed min-label loop:
    // both physical strategies must return the identical assignment
    val gotDist = Clusters.connectedComponents(pairs, collectEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(gotDist === expect)
    val canon = Clusters.canonicalAssignment(pairs)
      .filter(col("is_canonical")).select("doc_id").as[Long].collect().toSet
    assert(canon === Set(1L, 10L, 20L))
  }

  test("star-contraction components equal label propagation; deep chains converge in O(log) rounds") {
    // random-ish graph: star answers must match label propagation
    val rnd = new scala.util.Random(7)
    val randPairs = (0 until 200).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val viaStar = Clusters.connectedComponentsStar(randPairs)
      .as[(Long, Long)].collect().toMap
    val viaProp = Clusters.connectedComponents(randPairs, collectEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaStar === viaProp)

    // a 600-node chain has diameter 599: the distributed loop's
    // default 20 rounds cannot finish it (and throws rather than
    // returning bad labels); the driver union-find gate has no
    // iteration limit and resolves it exactly; star contraction
    // converges well inside its 50-round bound
    val chain = (0L until 599L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Clusters.connectedComponents(chain, collectEdges = 0L).count()
    }
    val viaUf = Clusters.connectedComponents(chain).as[(Long, Long)].collect()
    assert(viaUf.length === 600 && viaUf.forall(_._2 === 0L))
    val labels = Clusters.connectedComponentsStar(chain).as[(Long, Long)].collect()
    assert(labels.length === 600 && labels.forall(_._2 === 0L))
  }

  test("bloom-prefiltered decontamination equals the exact screen and prunes the scan side") {
    val docs = T.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 400)
    val bench = docs.filter(col("doc_id") >= 400)
    val exact = TextAnalysis.benchmarkOverlap(corpus, bench)
      .as[(Long, Long)].collect().toSet
    val bloomed = TextAnalysis.benchmarkOverlapBloom(corpus, bench)
    assert(bloomed.as[(Long, Long)].collect().toSet === exact,
      "the filter only prunes; the exact join must make results identical")
    // the probe must run in the corpus scan stage, below the join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing from plan:\n$plan")
  }

  test("BloomMightContain: no false negatives, low false-positive rate, codegen probe") {
    val members = (0 until 2000).map(i => s"member_$i")
    val bg = members.toDF("v")
    val filter = bg.stat.bloomFilter("v", members.size.toLong, 0.01)
    val probeCol = graft.functions.BloomMightContain(col("v"), filter)
    val hits = bg.filter(probeCol).count()
    assert(hits === members.size.toLong, "a Bloom filter can never report false negatives")
    val nonMembers = (0 until 2000).map(i => s"other_$i").toDF("v")
    val fp = nonMembers.filter(probeCol).count()
    assert(fp < 100, s"false-positive rate out of spec: $fp/2000")
  }

  test("CMS-pruned heavy hitters equal the unfiltered aggregation; prune is real") {
    val docs = T.documents(spark, sf)
    val plain = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().filter(col("count") >= 100)
      .as[(String, Long)].collect().toMap
    val pruned = TextAnalysis.heavyHitters(docs, 100)
      .as[(String, Long)].collect().toMap
    assert(pruned === plain, "one-sided CMS prune must never lose a true heavy hitter")
    assert(plain.nonEmpty)
    // and the sketch actually filters: rare tokens must be pruned
    // before the exchange (estimate below threshold somewhere)
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val sketch = toks.stat.countMinSketch("tok", 0.0001, 0.99, 42)
    val kept = toks.filter(graft.functions.CmsEstimate(col("tok"), sketch) >= 100).count()
    assert(kept < toks.count(), "the prune must drop below-threshold tokens map-side")
  }

  test("salted join equals the plain join on skewed keys") {
    val left = spark.range(0, 10000)
      .select(when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 10).as("dim"))
    def counted(df: org.apache.spark.sql.DataFrame): Map[(Long, Long, Long), Long] =
      df.select("k", "payload", "dim").as[(Long, Long, Long)]
        .collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    val plain = counted(left.join(right, Seq("k")))
    val salted = counted(Skew.saltedJoin(left, right, Seq("k"), 16))
    assert(salted === plain, "salting must be invisible in the result multiset")
    assert(plain.nonEmpty)
  }

  test("salted join: left-outer equality, saltSource duplicate-row spread, guards") {
    // even ids collapse onto hot key 0 (matched in right); odd ids get
    // keys >= 10000 that right lacks, so left-outer must null-extend
    // each exactly once despite the x16 dim replication.
    val left = spark.range(0, 2000)
      .select(when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") + 10000).as("k"),
        lit(7L).as("payload"), col("id").as("row_id"))
    val right = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 10).as("dim"))
    def counted(df: org.apache.spark.sql.DataFrame): Map[(Long, Long, Long, Option[Long]), Long] =
      df.select("k", "payload", "row_id", "dim").as[(Long, Long, Long, Option[Long])]
        .collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    val plain = counted(left.join(right, Seq("k"), "left"))
    val salted = counted(Skew.saltedJoin(left, right, Seq("k"), 16,
      joinType = "left", saltSource = Some("row_id")))
    assert(salted === plain, "salting must be invisible under left-outer too")
    assert(plain.exists(_._1._4.isEmpty), "the fixture must exercise unmatched rows")
    // The documented blind spot: rows identical in every column share a
    // whole-row-hash salt (hot key 0 here has constant (k, payload)),
    // while a caller-named unique column spreads them across sub-keys.
    val dupSalts = left.where(col("k") === 0)
      .select(pmod(xxhash64(col("k"), col("payload")), lit(16L)).as("s"))
      .distinct().count()
    assert(dupSalts === 1L, "identical rows collapse onto one salt by construction")
    val idSalts = left.where(col("k") === 0)
      .select(pmod(xxhash64(col("row_id")), lit(16L)).as("s"))
      .distinct().count()
    assert(idSalts > 8L, s"unique saltSource must spread the hot key, got $idSalts/16 salts")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left.withColumn(Skew.SaltCol, lit(1)), right, Seq("k"), 16)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("k"), 16, joinType = "full")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("k"), 16, saltSource = Some("nope"))
    }
  }

  test("cosine is symmetric and 1.0 on self") {
    val e = T.embeddings(spark, sf).limit(3)
    val selfCos = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    assert(selfCos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("histogram quantile sketch: merge is lossless, bound holds at q=0.1/0.5/0.9") {
    val (lo, hi, bins) = (0L, 60000L, 256)
    val width = (hi - lo).toDouble / bins
    val ev = T.events(spark, sf).select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    def hist(df: org.apache.spark.sql.DataFrame) =
      Sketches.histSketch(df, Seq("event_type"), col("cents"), lo, hi, bins)
    def asMap(df: org.apache.spark.sql.DataFrame): Map[(String, Int), Long] =
      df.as[(String, Int, Long)].collect().map { case (g, b, n) => (g, b) -> n }.toMap
    // lossless merge: merge(hist(A), hist(B)) ≡ hist(A ∪ B) bit-for-bit
    val a = ev.filter(col("cents") % 2 === 0)
    val b = ev.filter(col("cents") % 2 =!= 0)
    val merged = Sketches.histMerge(hist(a).unionByName(hist(b)), Seq("event_type"))
    assert(asMap(merged) === asMap(hist(ev)))
    // bound: estimate within one bin width of the exact k-th smallest
    val exactByGroup = ev.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = Sketches.histQuantile(merged, Seq("event_type"), q, lo, hi, bins)
        .select("event_type", "q_est").as[(String, Double)].collect().toMap
      exactByGroup.foreach { case (g, sorted) =>
        val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
        assert(math.abs(est(g) - exact) <= width,
          s"q=$q group=$g est=${est(g)} exact=$exact width=$width")
      }
    }
  }

  test("langid is deterministic and covers the whole corpus") {
    val out = T.documents(spark, sf)
      .select(TextAnalysis.langId(col("text")).as("l"))
      .groupBy("l").count().as[(String, Long)].collect().toMap
    assert(out.values.sum === 500L)
  }

  test("gapFill: dense grid per key, last-in-bucket wins, gaps carry forward") {
    // key 1: obs at t=5 (v=10), t=7 (v=20, later event wins bucket 0
    //        at step 10), t=25 (v=30) — buckets 0,10,20; bucket 10 is
    //        a gap and must carry 20
    // key 2: single obs → single bucket, no fill needed
    val df = Seq(
      (1L, 5L, 1L, 10.0), (1L, 7L, 2L, 20.0), (1L, 25L, 3L, 30.0),
      (2L, 103L, 4L, 7.0))
      .toDF("k", "ts", "pos", "v")
    val got = Temporal.gapFill(df, Seq("k"), "ts", 10L, "v",
        struct(col("ts"), col("pos")))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 0L, 20.0), (1L, 10L, 20.0), (1L, 20L, 30.0),
      (2L, 100L, 7.0)))
    // same-ts tie breaks on the ord tiebreaker (pos)
    val tie = Seq((1L, 5L, 1L, 1.0), (1L, 5L, 9L, 2.0)).toDF("k", "ts", "pos", "v")
    val t = Temporal.gapFill(tie, Seq("k"), "ts", 10L, "v",
        struct(col("ts"), col("pos")))
      .as[(Long, Long, Double)].collect().toSeq
    assert(t === Seq((1L, 0L, 2.0)))
  }

  test("coverageCounts: sweep ≡ bucketed range join ≡ brute force; boundary ties inclusive") {
    // planted boundaries: point exactly AT start and AT end must count
    // (BETWEEN semantics); just outside must not; bucket boundary
    // crossing exercised by the 10-width bucket
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 20L), (4L, 21L), (5L, 9L))
      .toDF("pid", "ts")
    val ivs = Seq((10L, 20L), (15L, 35L)).toDF("s0", "s1")
    val got = Temporal.coverageCounts(pts, "pid", "ts", ivs, "s0", "s1", 10L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))

    // law: on seeded random data the sweep equals BOTH the bucketed
    // pair join aggregated to counts and a scalar brute force
    val rnd = new scala.util.Random(20260815L)
    val rp = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("pid", "ts")
    val rpLocal = rp.as[(Long, Long)].collect()
    val riLocal = (1 to 200).map { _ =>
      val s = rnd.nextInt(1000).toLong; (s, s + rnd.nextInt(60).toLong)
    }
    val ri = riLocal.toDF("s0", "s1")
    val sweep = Temporal.coverageCounts(rp, "pid", "ts", ri, "s0", "s1", 37L)
      .as[(Long, Long)].collect().toMap
    val brute = rpLocal.map { case (pid, t) =>
      pid -> riLocal.count(iv => iv._1 <= t && t <= iv._2).toLong
    }.toMap
    assert(sweep === brute)
    val joined = Temporal.rangeJoinBucketed(rp, "ts",
        ri.withColumn("iid", monotonically_increasing_id()), "s0", "s1", 37L)
      .groupBy("pid").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(brute.filter(_._2 > 0L) === joined,
      "bucketed pair join (inner) must agree on every covered point")
    assert(brute.values.exists(_ > 1L) && brute.values.exists(_ == 0L),
      "fixture degenerate: need multi-covered and uncovered points")
  }

  test("gapInterp: anchors exact, gaps draw the line, negative slope truncates toward zero") {
    // key 1 (step 10, integer values): anchors at buckets 0 (v=0) and
    // 30 (v=9) — gaps 10,20 interpolate to 3, 6 (exact thirds);
    // key 2: NEGATIVE slope 100→(-8) over 3 steps: per-gap
    // (-108)*1 div 3 = -36 truncating: bucket 10 → 64, bucket 20 → 28
    // (floor semantics would give the same here; the -1/3 case below
    // pins truncation specifically)
    val df = Seq(
      (1L, 0L, 1L, 0L), (1L, 35L, 2L, 9L),
      (2L, 0L, 3L, 100L), (2L, 30L, 4L, -8L))
      .toDF("k", "ts", "pos", "v")
    val got = Temporal.gapInterp(df, Seq("k"), "ts", 10L, "v",
        struct(col("ts"), col("pos")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 0L), (1L, 10L, 3L), (1L, 20L, 6L), (1L, 30L, 9L),
      (2L, 0L, 100L), (2L, 10L, 64L), (2L, 20L, 28L), (2L, 30L, -8L)))
    // truncation-toward-zero pin: 0 → -1 over 3 steps: per-gap
    // delta -1*i div 3 = 0 for i=1,2 (floor would give -1)
    val neg = Seq((3L, 0L, 5L, 0L), (3L, 30L, 6L, -1L))
      .toDF("k", "ts", "pos", "v")
    val n = Temporal.gapInterp(neg, Seq("k"), "ts", 10L, "v",
        struct(col("ts"), col("pos")))
      .as[(Long, Long, Long)].collect().toSet
    assert(n === Set((3L, 0L, 0L), (3L, 10L, 0L), (3L, 20L, 0L), (3L, 30L, -1L)))
    // non-vacuity vs forward fill: the interpolated gaps above differ
    // from what gapFill would carry (3,6 vs 0,0) — the two resamplers
    // are genuinely different operators on the same input
    val ff = Temporal.gapFill(df.withColumn("v", col("v").cast("double")),
        Seq("k"), "ts", 10L, "v", struct(col("ts"), col("pos")))
      .as[(Long, Long, Double)].collect().toSet
    assert(ff.contains((1L, 10L, 0.0)) && got.contains((1L, 10L, 3L)))
  }

  test("duplicated-span detection matches a brute-force scan; planted boilerplate surfaces") {
    val rnd = new scala.util.Random(7)
    val boiler = (0 until 12).map(i => s"b$i")
    val docs = (0L until 60L).map { id =>
      val words = Vector.fill(5 + rnd.nextInt(20))(s"w${rnd.nextInt(40)}")
      val text = if (id % 3 == 0) (words.take(4) ++ boiler ++ words.drop(4)).mkString(" ")
                 else words.mkString(" ")
      (id, text)
    }
    def grams(t: String): Seq[String] = {
      val toks = t.split(" ")
      if (toks.length < 8) Seq.empty else toks.sliding(8).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap { case (id, t) => grams(t).map(g => (id, g)) }
    val truth = all.groupBy(_._2).collect {
      case (g, occ) if occ.map(_._1).distinct.size >= 2 =>
        (g, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.toSet
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df)
      .select("gram", "n_docs", "n_occ").as[(String, Long, Long)].collect().toSet
    assert(got === truth)
    // the planted 12-token boilerplate yields 5 duplicated 8-gram positions
    assert(got.exists(_._1.startsWith("b0 b1 b2")))
    val dupSet = truth.map(_._1)
    val covTruth = docs.flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else Some((id, gs.size.toLong, gs.count(dupSet.contains).toLong))
    }.toSet
    val cov = Dedup.spanDupStats(df)
      .select("doc_id", "n_grams", "n_dup").as[(Long, Long, Long)].collect().toSet
    assert(cov === covTruth)
  }

  test("charLmScore: MLE trigram math vs a local reference; held-out model drops unseen grams") {
    import spark.implicits._
    val docs = Seq((1L, "abcabc"), (2L, "abcd"), (3L, "xy")).toDF("doc_id", "text")
    // local reference over the same corpus
    val corpus = Seq("abcabc", "abcd")
    def gramsOf(t: String): Seq[String] =
      if (t.length < 3) Seq.empty else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val all = (corpus :+ "xy").flatMap(gramsOf) // doc 3 contributes nothing
    val cg = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cc = all.groupBy(_.take(2)).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.charLmScore(docs)
      .select("doc_id", "n_pos", "sum_cg", "sum_cc", "bits_per_char")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(3L), "sub-n docs have no positions")
    Seq(1L -> "abcabc", 2L -> "abcd").foreach { case (id, t) =>
      val gs = gramsOf(t)
      val (exp1, exp2) = (gs.map(cg).sum, gs.map(g => cc(g.take(2))).sum)
      val expBits = gs.map(g => math.log(cc(g.take(2)).toDouble / cg(g)) / math.log(2.0))
        .sum / gs.size
      val (_, nPos, sumCg, sumCc, bits) = got(id)
      assert(nPos === gs.size.toLong && sumCg === exp1 && sumCc === exp2)
      assert(math.abs(bits - expBits) < 1e-9, s"doc $id bits")
    }
    // held-out model: doc grams absent from the model drop out and
    // n_pos shrinks accordingly (P=0 has no finite score)
    val model = Seq((10L, "abcd")).toDF("doc_id", "text")
    val held = TextAnalysis.charLmScore(docs, Some(model))
      .select("doc_id", "n_pos").as[(Long, Long)].collect().toMap
    // model grams: abc, bcd. doc1 "abcabc": positions abc,bca,cab,abc → only 2 score
    assert(held(1L) === 2L)
    assert(held(2L) === 2L) // abc, bcd both in model
  }

  test("bpePairStats counts adjacent pairs; applyBpeMerge is left-greedy non-overlapping") {
    val docs = Seq(
      (1L, "x x x"),           // self-pair overlap: must merge LEFT pair only
      (2L, "a b a b"),         // two disjoint occurrences: both merge
      (3L, "a b b a"),         // one occurrence + reversed (no match)
      (4L, "solo")             // single token: no pairs
    ).toDF("doc_id", "text")
    // hand-counted adjacent pairs
    val got = TextAnalysis.bpePairStats(docs, 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got(("x", "x")) === 2L) // positions (0,1) and (1,2) both count
    assert(got(("a", "b")) === 3L)
    assert(got(("b", "a")) === 2L)
    assert(got(("b", "b")) === 1L)
    assert(!got.contains(("solo", "solo")))

    def merge(t: String, a: String, b: String): String =
      docs.filter(col("text") === t)
        .select(TextAnalysis.applyBpeMerge(col("text"), a, b)).head().getString(0)
    assert(merge("x x x", "x", "x") === "x+x x")   // greedy left, no overlap
    assert(merge("a b a b", "a", "b") === "a+b a+b")
    assert(merge("a b b a", "a", "b") === "a+b b a")
    assert(merge("solo", "a", "b") === "solo")
    // merged token participates in later rounds: a second merge over the
    // rewritten stream sees ("a+b", "a+b") as an adjacent pair
    val round2 = TextAnalysis.bpePairStats(
      docs.select(TextAnalysis.applyBpeMerge(col("text"), "a", "b").as("text")), 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(round2(("a+b", "a+b")) === 1L)
  }

  test("normalizeText: NFC composes, casefolds, collapses whitespace; codegen'd") {
    import graft.functions.TextExpressions.unicodeNormalize
    val rows = Seq(
      (1L, "café TIME"),      // decomposed e + U+0301
      (2L, "caf\u00e9 time"),       // precomposed é — same canonical form
      (3L, "a  b\t c"),             // whitespace runs
      (4L, "plain ascii")
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("n"),
        length(unicodeNormalize(col("text"))).as("len_nfc"),
        length(col("text")).as("len_raw"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    // 1 and 2 normalize to the SAME string (the whole point: canonical
    // equivalence becomes bytewise equality for downstream hashing)
    assert(out(1L)._1 === out(2L)._1)
    assert(out(1L)._1 === "caf\u00e9 time")
    // composition shrank the decomposed doc by one code point
    assert(out(1L)._3 - out(1L)._2 === 1)
    assert(out(3L)._1 === "a b c")
    assert(out(4L)._1 === "plain ascii")
    // idempotence: normalizing a normalized corpus is a no-op
    val once = rows.select(TextAnalysis.normalizeText(col("text")).as("t"))
    val twice = once.select(TextAnalysis.normalizeText(col("t")).as("t"))
    assert(once.collect().map(_.getString(0)).toSeq ===
      twice.collect().map(_.getString(0)).toSeq)
    // NFD is the inverse direction: expands the precomposed char
    assert(rows.filter(col("doc_id") === 2)
      .select(length(unicodeNormalize(col("text"), "NFD"))).head().getInt(0) === 10)
    // stays inside whole-stage codegen — no fallback iterator in the
    // plan (a local relation constant-folds, so assert on a real scan)
    val plan = T.documents(spark, sf)
      .select(TextAnalysis.normalizeText(col("text"))).queryExecution
      .executedPlan.toString
    // the "*(1)" star marks the Project as INSIDE a codegen stage; a
    // CodegenFallback expression would strip it
    assert(plan.contains("*(1) Project"), plan)
  }

  test("splitLeakageSafe: clusters never straddle a split; singletons match splitAssign") {
    val docs = T.documents(spark, sf)
    val pairs = Dedup.ngramJaccardVerify(Dedup.minhashCandidates(docs), docs)
      .select("id_a", "id_b")
    assert(pairs.count() > 0, "fixture must have near-dup pairs")
    val safe = Packing.splitLeakageSafe(docs, pairs, trainPermille = 500,
      valPermille = 250) // aggressive split so straddling would be likely
    // every cluster representative maps to exactly one split
    val perRep = safe.groupBy("rep_id").agg(countDistinct("split").as("nsplits"))
    assert(perRep.filter(col("nsplits") > 1).count() === 0L,
      "a near-dup cluster must land entirely on one side")
    // the naive per-doc split DOES straddle at least one cluster here —
    // the property is not vacuous on this corpus
    val naive = Packing.splitAssign(docs, col("doc_id"), 500, 250)
      .select(col("doc_id"), col("split"))
    val canon = Clusters.canonicalAssignment(pairs)
      .select(col("doc_id"), col("canonical_id"))
    val naiveStraddles = naive.join(canon, "doc_id")
      .groupBy("canonical_id").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(naiveStraddles > 0, "fixture must make the naive split leak")
    // docs in no cluster keep their plain splitAssign bucket exactly
    val clustered = canon.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val safeMap = safe.select("doc_id", "split_bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naiveMap = Packing.splitAssign(docs, col("doc_id"), 500, 250)
      .select("doc_id", "split_bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val singles = safeMap.keySet -- clustered
    assert(singles.nonEmpty)
    assert(singles.forall(id => safeMap(id) === naiveMap(id)),
      "unclustered docs must be assigned exactly as plain splitAssign")
  }

  test("sampleMixtureUpsample: sub-1000 rates equal sampleMixture; upsampled copies are dense") {
    val docs = T.documents(spark, sf).select(col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"))
    val total = docs.agg(sum("tokens")).head().getLong(0)
    val weights = Map("src0" -> 10L)
    val up = Packing.sampleMixtureUpsample(docs, "source", "doc_id", col("tokens"),
      weights, 1L, total)
    val down = Packing.sampleMixture(docs, "source", "doc_id", col("tokens"),
      weights, 1L, total)
    // in the downsampling regime (rate < 1000) the kept doc set is identical
    val upDown = up.filter(col("rate_permille") < 1000)
      .select("doc_id").distinct().as[Long].collect().toSet
    val downSet = down.filter(col("keep_rate") < 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(upDown === downSet, "sub-1000 rates must reproduce sampleMixture exactly")
    // src0 is under-supplied: every doc duplicated, copy_idx dense 1..n
    val src0 = up.filter(col("source") === "src0")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy_idx").as("mx"),
        min("copy_idx").as("mn"))
      .collect()
    assert(src0.nonEmpty)
    assert(src0.forall(r => r.getLong(1) >= 2L), "under-supplied source must upsample")
    assert(src0.forall(r => r.getLong(2) === r.getLong(1) && r.getLong(3) === 1L),
      "copy indices must be dense 1..n")
    // tokens delivered for src0 land within one doc of its demand
    val delivered = up.filter(col("source") === "src0").agg(sum("tokens")).head().getLong(0)
    val demand = total * 10L / (10L + 19L)
    assert(math.abs(delivered - demand) <= total / 100 + 700,
      s"delivered=$delivered demand=$demand")
  }

  test("madTrim keeps the robust core and drops planted outliers per group") {
    // group a: median 10, MAD 1 → k=3 keeps [7, 13]; 100 and 1 are out
    // group b: all identical → MAD 0 → ONLY exact-median rows survive
    val df = Seq(
      ("a", 9L), ("a", 10L), ("a", 11L), ("a", 12L), ("a", 8L),
      ("a", 100L), ("a", 1L),
      ("b", 5L), ("b", 5L), ("b", 5L), ("b", 7L)
    ).toDF("g", "v")
    val kept = TextAnalysis.madTrim(df, col("v"), col("g"), k = 3.0)
      .select("g", "v").as[(String, Long)].collect().toSeq.sorted
    // a: sorted 1,8,9,10,11,12,100 → med 10; |v−10| = 9,2,1,0,1,2,90 →
    //    sorted 0,1,1,2,2,9,90 → mad 2 → keep |v−10| ≤ 6 → 8..12
    assert(kept.filter(_._1 == "a").map(_._2) === Seq(8L, 9L, 10L, 11L, 12L))
    // b: med 5, deviations 0,0,0,2 → mad 0 → keep only v = 5
    assert(kept.filter(_._1 == "b").map(_._2) === Seq(5L, 5L, 5L))
    // mean/stddev would NOT have recovered group a's core: the 100
    // outlier drags the mean to ~21.6, which a ±1σ screen centers on.
    // (That asymmetry is the point of the robust statistic.)
  }

  test("dedupSegments: keep-first drops every later copy, reassembly is order-exact") {
    // doc 0 and doc 2 share the segment "a b c d e"; doc 0 has the
    // lower id so it keeps its copy. doc 1 is untouched. The short
    // tail segment ("z") must survive and reassemble in position.
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "p q r s t u v w x y"),
      (2L, "a b c d e m n o p q z")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, segTokens = 5, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) === ((0L, 2L, 0L, 10L, "a b c d e f g h i j")))
    assert(out(1) === ((1L, 2L, 0L, 10L, "p q r s t u v w x y")))
    // doc 2: first segment dropped (keeper is doc 0), rest survive in order
    assert(out(2) === ((2L, 3L, 1L, 6L, "m n o p q z")))

    // a doc that is ALL duplicated segments empties to '' with count 0
    val docs2 = Seq((0L, "a b c d e"), (5L, "a b c d e")).toDF("doc_id", "text")
    val out2 = Dedup.dedupSegments(docs2, segTokens = 5, minDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect()
    assert(out2(0) === ((0L, 1L, 0L, 5L, "a b c d e")))
    assert(out2(1) === ((5L, 1L, 1L, 0L, "")))
  }

  test("rrfFuse: integer RRF arithmetic, cross-system agreement outranks a single #1") {
    // doc 10 is rank 2 in BOTH systems: 2·(10⁹ div 62) = 32258064·2.
    // doc 1 is rank 1 lexically only: 10⁹ div 61 = 16393442.
    // Agreement wins — the property RRF exists for.
    val lex = Seq(("q", 1L, 1), ("q", 10L, 2), ("q", 3L, 3))
      .toDF("query", "doc_id", "rk")
    val den = Seq(("q", 7L, 1), ("q", 10L, 2), ("q", 4L, 3))
      .toDF("query", "doc_id", "rk")
    val out = Retrieval.rrfFuse(Seq(lex, den), 10)
      .orderBy("rk").as[(String, Int, Long, Long, Long)].collect()
    assert(out.head === (("q", 1, 10L, 2L * (1000000000L / 62), 2L)))
    assert(out.map(_._3).toSeq === Seq(10L, 1L, 7L, 3L, 4L),
      "rank-1 singles tie at div 61 and break by doc_id; rank-3 singles follow")
    assert(out.forall(r => r._4 === Retrieval.rrfFuse(Seq(lex, den), 10)
      .filter(col("doc_id") === r._3).select("rrf_nano").as[Long].head()))
  }

  test("chunkDocs: full coverage, overlap arithmetic, short docs, disjoint partition at stride=chunk") {
    val docs = Seq(
      (1L, (0 until 200).map(i => s"w$i").mkString(" ")), // 200 toks
      (2L, (0 until 64).map(i => s"x$i").mkString(" ")),  // exactly one chunk
      (3L, "just three tokens"),                          // short doc
      (4L, (0 until 65).map(i => s"y$i").mkString(" "))   // one past the boundary
    ).toDF("doc_id", "text")
    val ch = TextAnalysis.chunkDocs(docs, col("doc_id"), col("text"), 64, 48)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_chunk_toks", $"n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = ch.groupBy(_._1)
    // chunk counts: 200 → ceil((200-64)/48)=3 → 4 chunks; 64 → 1; 3 → 1; 65 → 2
    assert(byDoc.view.mapValues(_.length).toMap === Map(1L -> 4, 2L -> 1, 3L -> 1, 4L -> 2))
    // every token position covered; starts advance by exactly the stride
    byDoc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3) === sorted.indices.map(_ * 48L))
      val n = sorted.head._5
      assert(sorted.last._3 + sorted.last._4 === n, "last chunk must reach the end")
      assert(sorted.forall(r => r._4 === math.min(64L, n - r._3)))
    }
    // stride == chunk: a disjoint exact partition of the tokens
    val flat = TextAnalysis.chunkDocs(docs, col("doc_id"), col("text"), 64, 64)
      .groupBy("doc_id").agg(sum("n_chunk_toks").as("covered"),
        first("n_tokens").as("n"))
      .as[(Long, Long, Long)].collect()
    assert(flat.forall(r => r._2 === r._3), s"disjoint chunks must tile exactly: ${flat.toSeq}")
  }

  test("quantizeInt8: code range, endpoint mapping, error bound, degenerate vectors") {
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f, 2.0f, 3.0f)),         // linear ramp
      (2L, Array(-5.5f, 0.25f, 7.75f, -1.0f)),     // mixed signs
      (3L, Array(4.0f, 4.0f, 4.0f, 4.0f)),         // degenerate span
      (4L, Array(1e-6f, -1e-6f, 0.0f, 5e-7f))      // tiny span
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, col("embedding"))
      .select($"vec_id", $"vmin", $"vmax", $"codes", $"abs_err_sum")
      .as[(Long, Double, Double, Seq[Long], Double)].collect()
      .map(r => r._1 -> r).toMap

    q.values.foreach { case (id, vmin, vmax, codes, err) =>
      assert(codes.forall(c => c >= 0 && c <= 255), s"vec $id codes out of range")
      if (vmax > vmin) {
        // endpoints map to the rail codes, error per element ≤ scale/2
        val scale = (vmax - vmin) / 255.0
        assert(codes.min === 0L && codes.max === 255L, s"vec $id endpoint codes")
        assert(err <= codes.size * scale / 2 + 1e-12, s"vec $id err $err > bound")
      } else {
        assert(codes.forall(_ === 0L) && err === 0.0, s"vec $id degenerate")
      }
    }
    // exact reconstruction of a ramp that lands on code lattice points
    assert(q(1L)._4 === Seq(0L, 85L, 170L, 255L))
    assert(q(1L)._5 === 0.0)
  }

  test("textImportance: the hashed-bigram contrast actually separates the target language") {
    // The gate hash-pins the arithmetic; this pins the SIGNAL — the
    // importance score must rank the target (English) subcorpus above
    // the rest on average, or the selection pass selects nothing.
    val r = OpsQueries.textImportance(spark, sf)
      .join(T.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("score").cast("double")).as("mean_score"))
      .collect().map(x => (x.getBoolean(0), x.getDouble(1))).toMap
    assert(r(true) > r(false),
      s"mean score en=${r(true)} must exceed non-en=${r(false)}")
    assert(r(true) > 0.0, "target docs must score positive on average")
    // and every doc with >= 2 tokens is scored exactly once
    val n = OpsQueries.textImportance(spark, sf).count()
    val expected = T.documents(spark, sf)
      .filter(size(TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(n === expected)
  }

  test("gopherRules: each rule trips on exactly its planted violation; kept is the conjunction") {
    val ok = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while birds sing songs high above the trees"
    // Each doc violates EXACTLY one rule relative to `ok`.
    val docs = Seq(
      (0L, ok),                                                // all pass
      (1L, "the cats and dogs sat upon the mats here"),        // < 15 words
      (2L, ("the " + "abcdefghijklmnop " * 20).trim),          // mean word len > 5
      (3L, ok + " " + (1 to 30).map(_ => "a###").mkString(" ")), // symbols
      (4L, ok.split(' ').map(w => if (w == "the") w else "1234").mkString(" ")), // alpha
      (5L, ok.replace("the", "zzz").replace("and", "qqq")
             .replace("over", "ppp").replace("into", "kkk"))   // no stopwords
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    def flags(id: Long): Seq[Boolean] = (3 to 7).map(i => r(id).getBoolean(i))
    assert(flags(0).forall(identity) && r(0L).getBoolean(8))
    // planted docs: exactly ONE rule trips each
    assert(flags(1).count(!_) === 1 && flags(2).count(!_) === 1 &&
      flags(3).count(!_) === 1 && flags(4).count(!_) === 1 &&
      flags(5).count(!_) === 1)
    assert(!r(1L).getBoolean(3) && !r(1L).getBoolean(8))   // word_count
    assert(!r(3L).getBoolean(5) && !r(3L).getBoolean(8))   // symbol_ratio
    assert(!r(4L).getBoolean(6) && !r(4L).getBoolean(8))   // alpha_words
    assert(!r(5L).getBoolean(7) && !r(5L).getBoolean(8))   // stopwords
    // mean-word-length: doc 2 pushes mean above maxMeanLen
    assert(!r(2L).getBoolean(4) && !r(2L).getBoolean(8))
    // kept ≡ conjunction of the five flags, on every row
    r.values.foreach { row =>
      assert(row.getBoolean(8) === (3 to 7).forall(row.getBoolean))
    }
    // corpus law: the default thresholds keep SOME and drop SOME, and
    // every rule contributes at least one drop somewhere or passes all
    val corpus = TextAnalysis.gopherRules(T.documents(spark, sf)).cache()
    val kept = corpus.filter(col("kept")).count()
    assert(kept > 0 && kept < corpus.count())
    corpus.unpersist()
  }

  test("readability: hand-computed FRE/FKGL, clamps, and band ordering") {
    val docs = Seq(
      (0L, "Hello world. It is good."),
      (1L, ""), // degenerate: all counts clamp to 1
      (2L, "Incomprehensibility characterization! Institutionalization recontextualizes heterogeneous epistemological."),
      (3L, "a b! c") // 3 one-letter words, 1 sentence run, 1 vowel
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 0: w=5 s=2 y=6 → fre = 206835 - 5075/2 - 507600/5
    assert(r(0L).getLong(1) === 5L && r(0L).getLong(2) === 2L && r(0L).getLong(3) === 6L)
    assert(r(0L).getLong(4) === 206835L - 2537L - 101520L)
    assert(r(0L).getLong(5) === 975L + 14160L - 15590L)
    assert(r(0L).getString(6) === "very_easy")
    // empty text: every count clamps to 1, formulas still defined
    assert(r(1L).getLong(1) === 1L && r(1L).getLong(2) === 1L && r(1L).getLong(3) === 1L)
    assert(r(1L).getLong(4) === 206835L - 1015L - 84600L)
    // polysyllabic monster reads strictly harder than the plain doc
    assert(r(2L).getLong(4) < r(0L).getLong(4))
    assert(r(2L).getString(6) === "very_difficult")
    // w=3 s=1 y=1: fre = 206835 - 3045/1 - 84600/3
    assert(r(3L).getLong(4) === 206835L - 3045L - 28200L)
    // corpus law: real docs occupy >= 2 distinct bands, all rows scored
    val corpus = TextAnalysis.readability(T.documents(spark, sf))
    assert(corpus.count() === T.documents(spark, sf).count())
    assert(corpus.select("band").distinct().count() >= 2)
  }

  test("luhnScrub: checksum separates PANs from equally-long junk; only valid runs masked") {
    val valid16 = "4532015112830366" // passes Luhn
    val invalid16 = "4532015112830367" // last digit flipped
    val valid13 = "4222222222222" // 13-digit Visa test number
    val docs = Seq(
      (0L, s"pay $valid16 now"),
      (1L, s"order $invalid16 shipped"),
      (2L, "ref 123456789012 and 12345678901234567890"), // 12 + 20 digits: no candidates
      (3L, s"two cards $valid16 and $valid13 here"),
      (4L, "no digits at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.luhnScrub(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    def counts(id: Long) = (r(id).getLong(2), r(id).getLong(3), r(id).getLong(4))
    assert(counts(0L) === ((1L, 1L, 1L)))
    assert(r(0L).getString(5) === "pay [CARD] now")
    assert(counts(1L) === ((1L, 1L, 0L))) // candidate but checksum fails
    assert(r(1L).getString(5) === s"order $invalid16 shipped") // untouched
    assert(counts(2L) === ((2L, 0L, 0L))) // wrong lengths never candidates
    assert(counts(3L) === ((2L, 2L, 2L)))
    assert(r(3L).getString(5) === "two cards [CARD] and [CARD] here")
    assert(counts(4L) === ((0L, 0L, 0L)))
  }

  test("crossSourceNgramOverlap: shared grams counted once per source; containment of the smaller side") {
    val docs = Seq(
      // sources A and B share exactly ONE 3-gram ("x y z"); A repeats
      // it in two docs (distinct-per-source: still counts once)
      (0L, "x y z p q r", "A"),
      (1L, "m m x y z", "A"),
      (2L, "x y z k l m n", "B"),
      // C shares nothing 3-gram-long with anyone
      (3L, "u v w u v", "C"),
      // D is a strict subset mirror of B's grams
      (4L, "x y z k l", "D")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.crossSourceNgramOverlap(docs, n = 3).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // A: grams {xyz,yzp,zpq,pqr, mmx,mxy,xyz(dup)} → 6 distinct
    // B: {xyz,yzk,zkl,klm,lmn} → 5; D: {xyz,yzk,zkl} → 3
    assert(r(("A", "B")).getLong(2) === 1L) // only "x y z"
    assert(r(("A", "B")).getLong(3) === 6L && r(("A", "B")).getLong(4) === 5L)
    assert(r(("A", "B")).getLong(5) === 1000000L / 5L) // ppm vs min side
    assert(r(("B", "D")).getLong(2) === 3L) // D fully contained in B
    assert(r(("B", "D")).getLong(5) === 1000000L) // containment = 100%
    assert(!r.contains(("A", "C")) && !r.contains(("B", "C")))
    assert(r.keys.forall { case (a, b) => a < b }, "matrix is upper-triangular")
  }

  test("bpeTrain: hand-traced rounds, greedy non-overlap, count/apply asymmetry") {
    // round 1: the STATISTIC counts overlapping pairs — "x x x x" has
    // three (x,x) pairs + one in doc 1 → cnt 4; the greedy rewrite
    // fuses only the two non-overlapping occurrences in doc 0 + one
    // in doc 1 (the standard BPE count/apply asymmetry).
    val docs = Seq(
      (0L, "x x x x y"),
      (1L, "x x y z")
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, rounds = 2)
    assert(merges.head === ((1, "x", "x", 4L)))
    // after round 1: "x+x x+x y" / "x+x y z" — pairs: (x+x,x+x):1,
    // (x+x,y):2, (y,z):1 → round-2 winner (x+x, y) cnt 2
    assert(merges(1) === ((2, "x+x", "y", 2L)))
    // conservation: round 1 (self-pair, one triple+ run) removes 3
    // tokens (< cnt 4); round 2 (a ≠ b) removes exactly cnt = 2
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(size(TextAnalysis.tokens(col("text"))))).head().getLong(0)
    assert(total(docs) === 9L)
    val after1 = docs.withColumn("text",
      TextAnalysis.applyBpeMerge(col("text"), "x", "x"))
    assert(total(after1) === 6L, "greedy self-pair merge removes 3, not cnt=4")
    val after2 = after1.withColumn("text",
      TextAnalysis.applyBpeMerge(col("text"), "x+x", "y"))
    assert(total(after2) === 4L, "a != b merge removes exactly cnt")
    // early stop: a corpus with no adjacent pairs trains zero rounds
    val singles = Seq((0L, "x"), (1L, "y")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(singles, rounds = 3).isEmpty)
  }

  test("segmentSentences: boundaries, ordinality, terminator runs, honest fallbacks") {
    val docs = Seq(
      (0L, "One two. Three four! Five"),
      (1L, "no terminators at all"),
      (2L, "Really?! Yes... ok."),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.segmentSentences(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getString(2), x.getLong(3))))
      .toMap
    assert(r((0L, 0L)) === (("One two.", 2L)))
    assert(r((0L, 1L)) === (("Three four!", 2L)))
    assert(r((0L, 2L)) === (("Five", 1L)))
    // a terminator-free doc is ONE sentence
    assert(r((1L, 0L)) === (("no terminators at all", 4L)))
    assert(!r.contains((1L, 1L)))
    // multi-terminator runs stay attached to their sentence
    assert(r((2L, 0L)) === (("Really?!", 1L)))
    assert(r((2L, 1L)) === (("Yes...", 1L)))
    assert(r((2L, 2L)) === (("ok.", 1L)))
    // empty text yields zero rows
    assert(!r.keys.exists(_._1 === 3L))
  }

  test("langid confusion: planted misclassifications land in the right cells") {
    // labeled en but written with German stopwords → (en, de) cell;
    // labeled de classified correctly; no-stopword doc → (fr, und)
    val docs = Seq(
      (0L, "der hund und die katze ist nicht hier", "en"),
      (1L, "der das und ist nicht gut", "de"),
      (2L, "the cat and the dog is in a house", "en"),
      (3L, "xyz qqq zzz", "fr")
    ).toDF("doc_id", "text", "lang")
    val cells = docs.select(col("lang").as("lang_true"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .groupBy("lang_true", "lang_pred").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells(("en", "de")) === 1L)
    assert(cells(("en", "en")) === 1L)
    assert(cells(("de", "de")) === 1L)
    assert(cells(("fr", "und")) === 1L)
    // the corpus-level gate has real off-diagonal mass: sanity check
    val corpus = T.documents(spark, sf).select(col("lang"),
      TextAnalysis.langId(col("text")).as("p"))
    assert(corpus.filter(col("lang") =!= col("p")).count() > 0)
    assert(corpus.filter(col("lang") === col("p")).count() > 0)
  }

  test("sft_loss_mask: every exported offset re-slices to the response; spans cover the template") {
    val r = OpsQueries.sftLossMask(spark, sf)
    assert(r.filter(!col("offsets_valid")).count() === 0L,
      "claimed offsets must re-slice to the exact response on every row")
    // span arithmetic: resp_start + resp_len + len('<|end|>') = total
    assert(r.filter(col("resp_start") + col("resp_len") + 7 =!= col("total_len"))
      .count() === 0L)
    // mask fraction strictly between 0 and 1 on every row
    assert(r.filter(col("mask_ppm") <= 0 || col("mask_ppm") >= 1000000).count() === 0L)
  }

  test("privacy_k_anon: k counts the QI-tuple cohort; threshold flags exactly k < 5") {
    val r = OpsQueries.privacyKAnon(spark, sf).cache()
    // k is self-consistent: every (lang, source, band) group has
    // exactly k rows all reporting that same k
    val bad = r.groupBy("lang", "source", "len_band", "k")
      .count().filter(col("count") =!= col("k")).count()
    assert(bad === 0L, "each cohort's rows must all carry the cohort size")
    assert(r.filter(col("risky") =!= (col("k") < 5)).count() === 0L)
    // the synthetic corpus has both safe and risky docs — the verdict
    // is exercised on both sides
    assert(r.filter(col("risky")).count() > 0L)
    assert(r.filter(!col("risky")).count() > 0L)
    r.unpersist()
  }

  test("eval_sample_diversity: buckets partition the corpus; a self-covering sample maxes out") {
    val r = OpsQueries.evalSampleDiversity(spark, sf).cache()
    val total = r.agg(sum("n")).head().getLong(0)
    val sampleN = T.embeddings(spark, sf)
      .filter(expr("(vec_id * 554862419L) % 1000000 < 16000")).count()
    assert(total === T.embeddings(spark, sf).count() - sampleN,
      "every non-sample vector lands in exactly one decile")
    // ppm ranges nest inside their decile
    assert(r.filter(col("min_ppm") < col("decile") * 100000L ||
      col("max_ppm") >= (col("decile") + 1) * 100000L).count() === 0L)
    r.unpersist()
    // law: scoring a set against ITSELF puts everything in the top
    // bucket (cos(v, v) = 1)
    val e = T.embeddings(spark, sf).limit(50)
    val self = e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(e.select(col("vec_id").as("sid"),
        col("embedding").as("semb"))))
      .select(col("vec_id"),
        graft.ops.Similarity.cosine(col("embedding"), col("semb")).as("c"))
      .groupBy("vec_id").agg(max("c").as("best"))
    assert(self.filter(col("best") < 0.999999).count() === 0L)
  }

  test("editDistancePairs: known distances, blocking excludes cross-bucket, verdict threshold") {
    import spark.implicits._
    val docs = Seq(
      // same source+bucket (len 6,7 → bucket 0 at 32 chars): kitten/sitting d=3
      (1L, "s1", "kitten"), (2L, "s1", "sitting"),
      // identical pair → d=0, sim 1e6, is_near 1; bucket 2 (len 70)
      // keeps them out of the kitten pair's bucket 0
      (3L, "s1", "y" * 70), (4L, "s1", "y" * 70),
      // same source, different length bucket (len 6 vs 40) → NO pair
      (5L, "s2", "short1"),
      (6L, "s2", "x" * 40),
      // same bucket, different source → NO pair
      (7L, "s3", "kitten")
    ).toDF("doc_id", "source", "text")
    val r = Dedup.editDistancePairs(docs).collect()
      .map(x => (x.getLong(1), x.getLong(2)) -> x).toMap
    assert(r.keySet === Set((1L, 2L), (3L, 4L)))
    val kit = r((1L, 2L))
    assert(kit.getLong(3) === 3L) // levenshtein(kitten,sitting)
    assert(kit.getLong(6) === 1000000L - 3L * 1000000L / 7L)
    assert(kit.getLong(7) === 0L) // 571428 ppm < 700000
    val same = r((3L, 4L))
    assert(same.getLong(3) === 0L && same.getLong(6) === 1000000L
      && same.getLong(7) === 1L)
  }

  test("templateLeakage: markers flag per family, multi-marker doc counts once in n_flagged") {
    import spark.implicits._
    val docs = Seq(
      ("a", "clean text here"),
      ("a", "leaked <|im_start|> token"),
      ("a", "[INST] do the thing [/INST] <s> and {{name}}"), // 4 families, one doc
      ("b", "### Heading then prose"),
      ("b", "clean again")
    ).toDF("source", "text")
    val r = TextAnalysis.templateLeakage(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) === 3L) // n_docs
    assert(a.getLong(2) === 1L) // special <|
    assert(a.getLong(3) === 1L) // inst
    assert(a.getLong(4) === 0L) // heading
    assert(a.getLong(5) === 1L) // bos <s>
    assert(a.getLong(6) === 1L) // moustache
    assert(a.getLong(7) === 2L, "the 4-family doc counts once")
    assert(a.getLong(8) === 2L * 1000000L / 3L)
    val b = r("b")
    assert(b.getLong(4) === 1L && b.getLong(7) === 1L
      && b.getLong(8) === 500000L)
  }

  test("fleissKappaBinary laws: planted pools hit the closed-form kappa exactly") {
    def kappa(nPos: Seq[Long]): (Long, Long, Long) = {
      val r = OpsQueries.fleissKappaBinary(nPos.toDF("n_pos"), 5).head()
      (r.getAs[Long]("pbar_ppm"), r.getAs[Long]("pe_ppm"),
        r.getAs[Long]("kappa_ppm"))
    }
    // unanimous, mixed categories: perfect agreement, kappa = 1
    assert(kappa(Seq(5L, 5L, 0L, 0L)) === ((1000000L, 500000L, 1000000L)))
    // unanimous, ONE category: P̄e = 1 (den = 0), pinned to the ceiling
    assert(kappa(Seq(5L, 5L, 5L))._3 === 1000000L)
    // hand-computed mixed pool: [5,4,1,0] → P̄ = .8, P̄e = .5, κ = .6
    assert(kappa(Seq(5L, 4L, 1L, 0L)) === ((800000L, 500000L, 600000L)))
    // systematic disagreement: [2,3] → P̄ = .4 < P̄e = .5, κ = −.2 —
    // the negative-numerator branch of the shifted floor-division
    assert(kappa(Seq(2L, 3L)) === ((400000L, 500000L, -200000L)))
  }

  test("kneserNeyTable: hand-computed continuation counts and discounted ppm") {
    // pairs: (a,b):3 (b,a):3 (a,c):1 (b,b):1 → n_big=4
    // ctx a: c1=4 n_cont=2 top=(b,3); pred(b)={a,b}→2
    //   kn = ((12−3)·1e6)//16 + (3·2·((2·1e6)//4))//16 = 562500+187500
    // ctx b: c1=4 n_cont=2 top=(a,3); pred(a)={b}→1
    //   kn = 562500 + (6·250000)//16 = 562500+93750
    val docs = Seq((1L, "a b a b a c"), (2L, "b b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyTable(docs, 2L).orderBy("context")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("b", "a", 3L, 4L, 2L, 1L, 4L, 656250L),
      ("a", "b", 3L, 4L, 2L, 2L, 4L, 750000L)).sortBy(_._1))
  }

  test("knPplScores: hand-computed per-doc evidence, short-doc drop") {
    // same corpus as the kneserNeyTable test, so the pair-level table
    // is already hand-verified there; per-pair kn_ppm:
    //   (a,b) 750000, (b,a) 656250, (a,c) 62500+93750=156250,
    //   (b,b) 62500+187500=250000
    // doc 1 "a b a b a c": 2·750000 + 2·656250 + 156250 = 2968750 / 5
    // doc 2 "b b a b":     250000 + 656250 + 750000   = 1656250 / 3
    // doc 3 "x": one token → no bigram → dropped (the C39 contract)
    val docs = Seq((1L, "a b a b a c"), (2L, "b b a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knPplScores(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 5L, 2968750L, 593750L),
      (2L, 3L, 1656250L, 552083L)))
    // the doc riding the corpus-dominant transitions outscores the
    // one leaning on rare ones — the fluency signal the filter keys on
    assert(got(0)._4 > got(1)._4)
  }

  test("vocabGrowthCurve: planted growth, empty-checkpoint carry-forward") {
    // 10 docs, 5 checkpoints (2 docs each, 4 tokens each prefix step);
    // new vocab lands in checkpoints 1,2,3,5 — checkpoint 4 introduces
    // NOTHING, so its distinct count must carry forward, not zero out
    val docs = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "c a"), (3L, "a a"), (4L, "d b"),
      (5L, "a b"), (6L, "a b"), (7L, "a b"), (8L, "a b"), (9L, "f a")
    ).toDF("doc_id", "text")
    val got = Vocab.vocabGrowthCurve(docs, 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 4L, 2L),   // a, b
      (2L, 4L, 8L, 3L),   // + c
      (3L, 6L, 12L, 4L),  // + d
      (4L, 8L, 16L, 4L),  // nothing new — carried forward
      (5L, 10L, 20L, 5L))) // + f
  }

  test("bigramNextTable: counts, conditional ppm, ASC tie-break, minCtx floor, lowercase") {
    val docs = Seq(
      (1L, "go on go on go off"),
      (2L, "GO on stop"), // lowercases into the same context
      (3L, "z b z a z a z b") // context z: b and a tie at 2 → a wins
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramNextTable(docs, 2L)
      .orderBy("context")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", "z", 2L, 2L, 1000000L),
      ("go", "on", 3L, 4L, 750000L),
      ("on", "go", 2L, 3L, 666666L),
      ("z", "a", 2L, 4L, 500000L))) // context b (1 pair) under the floor
  }

  test("Prefix.globalRank + ntileFromRank: law vs window row_number/ntile, uneven cut") {
    import org.apache.spark.sql.expressions.Window
    // 10 rows, 4 groups → ntile sizes 3,3,2,2 (the uneven-cut branch)
    val df = Seq(7L, 3L, 9L, 1L, 5L, 2L, 8L, 4L, 6L, 10L).toDF("v")
      .repartition(7) // deliberately misaligned input layout
    val (ranked, total) = Prefix.globalRank(df, "rn", Seq(col("v")))
    assert(total === 10L)
    val got = ranked
      .withColumn("ph", Prefix.ntileFromRank("rn", 4, total).cast("int"))
      .orderBy("v").as[(Long, Long, Int)].collect().toSeq
    val want = df.withColumn("rn", row_number().over(Window.orderBy("v")).cast("long"))
      .withColumn("ph", ntile(4).over(Window.orderBy("v")))
      .orderBy("v").as[(Long, Long, Int)].collect().toSeq
    assert(got === want)
    // and no unpartitioned window in the prefix plan
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("Prefix.globalRank/ntileFromRank: law holds across shapes (ties, tiny n, n<groups)") {
    import org.apache.spark.sql.expressions.Window
    // (rows, key-modulus [small modulus ⇒ heavy ties], input partitions,
    //  ntile groups) — includes n < groups (q=0 branch), n == groups,
    // single row, and a 97%-tie column
    val shapes = Seq((1, 1, 1, 4), (3, 2, 2, 4), (4, 1, 3, 4),
      (257, 3, 7, 4), (1000, 1, 13, 7), (1000, 500, 5, 3))
    for ((n, mod, parts, groups) <- shapes) {
      val df = spark.range(0, n.toLong)
        .select(col("id"), pmod(col("id") * 2654435761L, lit(mod.toLong)).as("v"))
        .repartition(parts)
      val (ranked, total) = Prefix.globalRank(df, "rn", Seq(col("v"), col("id")))
      assert(total === n.toLong, s"shape $n/$mod/$parts")
      val got = ranked
        .withColumn("ph", Prefix.ntileFromRank("rn", groups, total).cast("int"))
        .orderBy("id").select("id", "rn", "ph")
        .as[(Long, Long, Int)].collect().toSeq
      val w = Window.orderBy(col("v"), col("id"))
      val want = df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("ph", ntile(groups).over(w))
        .orderBy("id").select("id", "rn", "ph")
        .as[(Long, Long, Int)].collect().toSeq
      assert(got === want, s"shape rows=$n mod=$mod parts=$parts groups=$groups")
    }
  }

  test("zipfCurve: planted counts at power-of-two ranks; law vs window re-derivation") {
    import org.apache.spark.sql.expressions.Window
    // a×8 b×4 c×2 d×1 → vocab 4, total 15; kept ranks 1,2,4(=final)
    val docs = Seq((1L, "a a a a b b c"), (2L, "a a a a b b c d"))
      .toDF("doc_id", "text")
    val got = Vocab.zipfCurve(docs)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a", 8L, 8L, 533333L),
      (2L, "b", 4L, 12L, 800000L),
      (4L, "d", 1L, 15L, 1000000L))) // rank 3 (c) not a power of two
    // law on real data: the prefix machinery equals a window re-derivation
    val real = T.documents(spark, sf)
    val naive = real.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt")).over(
        Window.orderBy(col("cnt").desc, col("token"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val nv = naive.count()
    val total = naive.agg(sum("cnt")).as[Long].head()
    val wantReal = naive
      .filter(expr("(rank & (rank - 1)) = 0") || col("rank") === nv)
      .withColumn("coverage_ppm", expr(s"cum_cnt * 1000000L div ${total}L"))
      .select("rank", "token", "cnt", "cum_cnt", "coverage_ppm")
      .orderBy("rank").as[(Long, String, Long, Long, Long)].collect().toSeq
    val gotReal = Vocab.zipfCurve(real)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(gotReal === wantReal)
  }

  test("collocations: hand-computed lift, minPair floor") {
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "the cat the dog the cat")
    ).toDF("doc_id", "text")
    // pairs: new→york×3 york→new×2 the→cat×2 cat→the×1 the→dog×1
    // dog→the×1 → N=10; marginals c1: new=3 york=2 the=3 cat=1 dog=1,
    // c2: york=3 new=2 cat=2 the=2 dog=1
    val got = CorpusStats.collocations(docs, minPair = 2L, k = 10)
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // york→new: pyx=2e6 div 2=1000000; lift=1e6*10 div 2=5000000
      ("york", "new", 2L, 2L, 2L, 1000000L, 5000000L),
      // new→york: pyx=3e6 div 3=1000000; lift=1e6*10 div 3=3333333
      ("new", "york", 3L, 3L, 3L, 1000000L, 3333333L),
      // the→cat: pyx=2e6 div 3=666666; lift=666666*10 div 2=3333330
      ("the", "cat", 2L, 3L, 2L, 666666L, 3333330L)))
  }

  test("termBurstiness: planted bursty vs uniform term, zero-doc mass in the moments") {
    val docs = Seq(
      (1L, "x x x x u"), (2L, "u y"), (3L, "u y"), (4L, "u y")
    ).toDF("doc_id", "text")
    val got = CorpusStats.termBurstiness(docs, minDf = 1L, k = 10)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // x: df=1 cf=4 s2=16 → 16e6/4 − 4e6/4 = 3000000 (bursty)
    // u: df=4 cf=4 s2=4  → 1e6 − 1e6 = 0 (uniform, one per doc)
    // y: df=3 cf=3 s2=3  → 1e6 − 750000 = 250000
    assert(got === Seq(
      ("x", 1L, 4L, 16L, 3000000L),
      ("y", 3L, 3L, 3L, 250000L),
      ("u", 4L, 4L, 4L, 0L)))
  }

  test("sourceKeyness: planted over-representation, staged exact ratio") {
    val docs = Seq(
      (1L, "aa aa aa bb", "A"), (2L, "bb bb bb aa", "B")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceKeyness(docs, minCnt = 1L, k = 2)
      .orderBy("source", "rk")
      .as[(String, Long, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // A: aa a=3 b=1 t_src=4 t_rest=4 → rate_s=750000 rate_r=250000
    //    ratio=750000*4 div 1 = 3000000; bb a=1 b=3 → rate_s=250000
    //    rate_r=750000 ratio=250000*4 div 3=333333
    assert(got === Seq(
      ("A", 1L, "aa", 3L, 1L, 750000L, 250000L, 3000000L),
      ("A", 2L, "bb", 1L, 3L, 250000L, 750000L, 333333L),
      ("B", 1L, "bb", 3L, 1L, 750000L, 250000L, 3000000L),
      ("B", 2L, "aa", 1L, 3L, 250000L, 750000L, 333333L)))
  }

  test("poissonBootstrap: unit mean weight, determinism, degenerate-accuracy laws") {
    val ids = (1L to 2000L).toDF("id")
    val w = ids.withColumn("b", explode(sequence(lit(0L), lit(3L))))
      .withColumn("w", CorpusStats.poissonWeight("id", "b"))
    val (n, sw) = w.agg(count(lit(1)), sum("w")).as[(Long, Long)].head()
    assert(n === 8000L)
    assert(math.abs(sw.toDouble / n - 1.0) < 0.05,
      s"mean Poisson(1) weight should be ~1, got ${sw.toDouble / n}")
    // deterministic: a second evaluation is bit-identical
    val again = ids.withColumn("b", explode(sequence(lit(0L), lit(3L))))
      .withColumn("w", CorpusStats.poissonWeight("id", "b"))
      .agg(sum("w")).as[Long].head()
    assert(again === sw)
    // degenerate laws: all-correct → 10⁶ ppm, all-wrong → 0, per replicate
    val allC = CorpusStats.poissonBootstrapAccuracy(
      ids.withColumn("correct", lit(1L)), col("id"), col("correct"), reps = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(allC.length === 4)
    allC.foreach { case (_, nEff, nc, acc) =>
      assert(nc === nEff); assert(acc === 1000000L)
    }
    val allW = CorpusStats.poissonBootstrapAccuracy(
      ids.withColumn("correct", lit(0L)), col("id"), col("correct"), reps = 4)
      .as[(Long, Long, Long, Long)].collect()
    allW.foreach { case (_, _, nc, acc) => assert(nc === 0L); assert(acc === 0L) }
  }

  test("sampleExactK: equals window truth, no sort/window in the plan, growth-stable") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("doc_id", "source")
    val got = Packing.sampleExactK(docs, col("source"), col("doc_id"), 3)
      .orderBy("stratum", "rk")
      .as[(String, Long, Long, Long)].collect().toSeq
    val P = 1000000007L
    val want = docs
      .withColumn("u", pmod(pmod(col("doc_id"), lit(P)) * 554862419L, lit(P)))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("u", "doc_id")).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("doc_id"), col("u"))
      .orderBy("source", "rk")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // bounded-buffer agg, not a per-stratum sort
    val plan = Packing.sampleExactK(docs, col("source"), col("doc_id"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window ["), plan)
    // growth stability: doubling the corpus only displaces, never reorders
    val grown = Packing.sampleExactK(
      (1L to 80L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
        .toDF("doc_id", "source"), col("source"), col("doc_id"), 3)
      .select("stratum", "doc_id").as[(String, Long)].collect().toSet
    val keptOld = got.map(t => (t._1, t._3)).toSet
    // every survivor of the grown run that is an OLD id was already kept
    assert(grown.filter(_._2 <= 40L).subsetOf(keptOld))
  }

  test("mixtureWaterfill: hand-computed level, full-funding and floor branches") {
    val docs = (Seq.fill(10)("A") ++ Seq.fill(20)("B") ++ Seq.fill(100)("C"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source").withColumn("t", lit(1L))
    def run(b: Long) =
      Packing.mixtureWaterfill(docs, col("source"), col("t"), b)
        .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    // B=60: k*=2 (A,B fully funded), tau=(60-30)/1=30 → C capped at 30
    assert(run(60L) === Seq(("A", 10L, 10L, 1000000L),
      ("B", 20L, 20L, 1000000L), ("C", 100L, 30L, 300000L)))
    // B=15: k*=0, tau=15 div 3=5 → everyone capped
    assert(run(15L) === Seq(("A", 10L, 5L, 500000L),
      ("B", 20L, 5L, 250000L), ("C", 100L, 5L, 50000L)))
    // B >= total: all fully funded
    assert(run(200L) === Seq(("A", 10L, 10L, 1000000L),
      ("B", 20L, 20L, 1000000L), ("C", 100L, 100L, 1000000L)))
  }

  test("krippendorffBinary: hand-computed alpha with missing ratings, degenerate laws") {
    // units: (3 keeps), (1k 1d), (1k 2d), (2d); the 1-rating unit drops
    // S2 = 0 + 1·1·2 + 1·2·1 + 0 = 4; n=10 n_k=5 n_d=5
    // alpha = 1 − 4·9/50 = 0.28 → pinned 280000 ppm exactly
    val ratings = Seq(
      (1L, 1L), (1L, 1L), (1L, 1L),
      (2L, 1L), (2L, 0L),
      (3L, 1L), (3L, 0L), (3L, 0L),
      (4L, 0L), (4L, 0L),
      (5L, 1L) // single rating — must drop
    ).toDF("doc_id", "keep")
    val got = OpsQueries.krippendorffBinary(ratings)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((4L, 10L, 5L, 5L, 4L, 280000L)))
    // perfect agreement → alpha 10⁶ exactly
    val perfect = Seq((1L, 1L), (1L, 1L), (2L, 0L), (2L, 0L))
      .toDF("doc_id", "keep")
    assert(OpsQueries.krippendorffBinary(perfect)
      .select("alpha_ppm").as[Long].head() === 1000000L)
    // systematic disagreement (every unit split) → alpha < 0
    val split = Seq((1L, 1L), (1L, 0L), (2L, 1L), (2L, 0L))
      .toDF("doc_id", "keep")
    assert(OpsQueries.krippendorffBinary(split)
      .select("alpha_ppm").as[Long].head() < 0L)
  }

  test("rbo: identical=10⁶ ppm exactly, reversed hand value, disjoint emits 0 row") {
    def rank(q: String, ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
        .toDF("query", "doc_id", "rk")
    val a = rank("q", 1L to 10L)
    assert(Retrieval.rbo(a, rank("q", 1L to 10L))
      .select("rbo_ppm").as[Long].head() === 1000000L)
    // reversed: m = max(r, 11−r) → [10,9,8,7,6,6,7,8,9,10], wsum =
    // 2·(W10+W9+W8+W7+W6) = 39520 → 39520·10⁶ div 2577960 = 15329 ppm
    val rev = Retrieval.rbo(a, rank("q", (1L to 10L).reverse))
      .as[(String, Long, Long, Long)].head()
    assert(rev === (("q", 10L, 39520L, 15329L)))
    // disjoint doc sets: the query still reports, at zero
    assert(Retrieval.rbo(a, rank("q", 11L to 20L))
      .as[(String, Long, Long, Long)].head() === (("q", 0L, 0L, 0L)))
  }

  test("textLangConsistency: planted code-switch splits, short docs drop") {
    val docs = Seq(
      (1L, "the cat and a dog is here x der hund ist nicht die katze"), // en|de
      (2L, "the cat and a dog is in the house and a bird too"), // en|en
      (3L, "xx yy zz ww qq rr ss tt"), // und|und — consistent by equality
      (4L, "the a of to") // 4 tokens < 8 — drops
    ).toDF("doc_id", "text")
    // the same half-split + argmax chain the gate runs, on planted docs
    val base = docs.select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
      .filter(size(col("ts")) >= 8)
      .withColumn("na", expr("size(ts) div 2"))
      .select(col("doc_id"),
        TextAnalysis.langId(expr("array_join(slice(ts, 1, na), ' ')")).as("lang_a"),
        TextAnalysis.langId(expr("array_join(slice(ts, na + 1, size(ts) - na), ' ')")).as("lang_b"))
      .withColumn("consistent", expr("CAST(lang_a = lang_b AS BIGINT)"))
      .orderBy("doc_id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(base === Seq(
      (1L, "en", "de", 0L),
      (2L, "en", "en", 1L),
      (3L, "und", "und", 1L)))
  }

  test("binary quantization: sign packing and Hamming distance are hand-exact on planted vectors") {
    import spark.implicits._
    // q0 = +1⁶⁴; c10 flips the upper 32 signs → hamming 32; c11 flips
    // all 64 → hamming 64. Both are the (only) float top-5 members.
    val ones = Array.fill(64)(1.0f)
    val half = Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)
    val neg = Array.fill(64)(-1.0f)
    val dir = java.nio.file.Files.createTempDirectory("graft_binq").toString
    Seq((0L, ones.toSeq, 0), (10L, half.toSeq, 0), (11L, neg.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = OpsQueries.embedQuantizeBinary(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sorted
    assert(got === Seq((0L, 10L, 32L, true), (0L, 11L, 64L, true)))
    graft.cdc.StoreFs.deleteRecursive(dir)
  }

  test("ivfAppend: incremental index append equals a full rebuild, lists and searches") {
    import spark.implicits._
    // fixed centroids → per-vector assignment → append ≡ rebuild is
    // exact, and a search over either index returns identical results
    val e = T.embeddings(spark, sf)
    val centroids = e.filter(col("vec_id") >= 10 && col("vec_id") < 42)
    val oldBatch = e.filter(col("vec_id") >= 10 && col("vec_id") < 300)
    val newBatch = e.filter(col("vec_id") >= 300)
    val queries = e.filter(col("vec_id") < 10)
    val appended = Similarity.ivfAppend(
      Similarity.ivfIndex(oldBatch, centroids), newBatch, centroids)
    val rebuilt = Similarity.ivfIndex(
      oldBatch.unionByName(newBatch), centroids)
    def lists(df: org.apache.spark.sql.DataFrame) =
      df.select("cid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lists(appended) === lists(rebuilt))
    def hits(idx: org.apache.spark.sql.DataFrame) =
      Similarity.annIvfSearch(queries, idx, centroids, 5, 4)
        .as[(Long, Long)].collect().toSet
    assert(hits(appended) === hits(rebuilt))
    // the delta actually landed: appended lists contain new-batch ids
    assert(lists(appended).exists(_._2 >= 300L))
  }

  test("evalMrr: reciprocal-rank/hit invariants on the gated run") {
    val got = OpsQueries.evalMrr(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (q, nRel, fr, rr, h1, h5, h10) =>
      assert(nRel >= 0L && nRel <= 10L, q)
      assert(fr >= 0L && fr <= 10L, q)
      if (fr > 0) assert(rr === 1000000L / fr, q) else assert(rr === 0L, q)
      assert(h1 <= h5 && h5 <= h10, q)
      assert((nRel > 0) === (h10 === 1L), q)
      if (h1 === 1L) assert(fr === 1L, q)
    }
  }
}
