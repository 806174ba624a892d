package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** Laws for sequence packing, split assignment, and connected
  * components (random-graph check against a local union-find).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("packing conserves tokens, bounds offsets, and chains within a bin") {
    val docs = spark.range(0, 5000)
      .select(col("id").as("doc_id"), (pmod(col("id") * 37, lit(400)) + 1).as("len"))
    val packed = Packing.packSequences(docs, col("len"), 512L, 8)
      .select($"doc_id", $"shard", $"tokens", $"seq_in_shard", $"offset_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect()

    // conservation
    assert(packed.map(_._3).sum ===
      docs.agg(sum("len")).as[Long].collect()(0))
    // every doc STARTS inside its bin
    assert(packed.forall(r => r._5 >= 0 && r._5 < 512))
    // within a (shard, seq): docs ordered by id chain exactly
    packed.groupBy(r => (r._2, r._4)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val expected = a._5 + a._3
          // either chains within the bin, or b starts a later bin (not this group)
          assert(expected === b._5 || expected >= 512,
            s"broken chain: $a -> $b")
        case _ => ()
      }
    }
  }

  test("split assignment is a stable partition with ~98/1/1 mass") {
    val docs = spark.range(0, 100000).select(col("id").as("doc_id"))
    val splits = Packing.splitAssign(docs, col("doc_id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet === Set("train", "val", "test"))
    assert(splits("train") > 95000 && splits("val") > 500 && splits("test") > 500)
    // stability: membership of a doc never depends on the corpus
    val subset = Packing.splitAssign(docs.filter(col("doc_id") < 1000), col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = Packing.splitAssign(docs, col("doc_id"))
      .filter(col("doc_id") < 1000)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(subset === full)
  }

  test("windowed HLL sketches merge to exactly the one-shot estimate") {
    val df = spark.range(0, 50000)
      .select((col("id") % 5).as("g"), (col("id") % 7919).as("v"), col("id"))
    val oneShot = Sketches.unionEstimate(
      Sketches.sketchBy(df, Seq("g"), col("v")), Seq("g"))
      .as[(Long, Long)].collect().toMap
    // split into 3 disjoint windows, sketch each, union
    val parts = (0 until 3).map(i => Sketches.sketchBy(
      df.filter(pmod(col("id"), lit(3)) === i), Seq("g"), col("v")))
    val merged = Sketches.unionEstimate(
      parts.reduce(_ unionByName _), Seq("g"))
      .as[(Long, Long)].collect().toMap
    // HLL register merge is max(): union of window sketches ==
    // sketch of the union, bit-exact
    assert(merged === oneShot)
  }

  test("token-budget selection equals the global prefix-sum contract at every boundary shape") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 2000L).map(id =>
      (id, rnd.nextInt(50).toLong, 1L + rnd.nextInt(400).toLong))
    val docs = rows.toDF("doc_id", "prio", "tokens")
    val total = rows.map(_._3).sum
    // reference: ONE global ordering, inclusive running sum <= budget
    def reference(budget: Long): Set[Long] = {
      var cum = 0L
      rows.sortBy { case (id, p, _) => (-p, id) }.flatMap { case (id, _, t) =>
        cum += t; if (cum <= budget) Some(id) else None
      }.toSet
    }
    // budgets: inside the top bucket, mid-corpus, an EXACT prefix fit
    // (forces the <=-inclusive edge), everything, and zero
    val exactFit = {
      var cum = 0L
      rows.sortBy { case (id, p, _) => (-p, id) }.map(_._3).take(700).sum
    }
    for (budget <- Seq(37L, total / 3, exactFit, total, total + 5, 0L)) {
      val got = Packing.selectTokenBudget(docs, "prio", "tokens", "doc_id", budget)
        .select("doc_id").as[Long].collect().toSet
      assert(got === reference(budget), s"budget $budget")
    }
  }

  test("mixture resampling: declared integer rates, keep-all cap, bucket membership") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 3000L).map { id =>
      (id, s"src${id % 5}", 10L + rnd.nextInt(200).toLong)
    }
    val docs = rows.toDF("doc_id", "source", "tokens")
    val weights = Map("src0" -> 6L, "src1" -> 2L)
    val kept = Packing.sampleMixture(docs, "source", "doc_id", col("tokens"),
        weights, defaultWeight = 1L, targetTokens = 150000L)
      .select("doc_id", "keep_rate").as[(Long, Long)].collect().toMap
    // local reference of the declared arithmetic
    val avail = rows.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    val sumW = avail.keys.toSeq.map(s => weights.getOrElse(s, 1L)).sum
    val rates = avail.map { case (s, t) =>
      s -> math.min(1000L, 1000L * (150000L * weights.getOrElse(s, 1L) / sumW) / t)
    }
    def bucket(id: Long): Long = ((id % 1000000007L) * 1000003L) % 1000000007L % 1000L
    val expect = rows.collect {
      case (id, s, _) if bucket(id) < rates(s) => id -> rates(s)
    }.toMap
    assert(kept === expect)
    // src0 demands 6/11 of 150k tokens > its ~64k available: capped at keep-all
    assert(rates("src0") === 1000L)
    assert(rows.filter(_._2 == "src0").map(_._1).toSet.subsetOf(kept.keySet))
    // a down-weighted source keeps roughly its rate permille of docs
    val n1 = rows.count(_._2 == "src1")
    val k1 = rows.filter(_._2 == "src1").count(r => kept.contains(r._1))
    assert(math.abs(k1.toDouble / n1 - rates("src1") / 1000.0) < 0.1)
  }

  test("mixture resampling gives NULL-source rows their allocated rate; budget selection rejects null prio") {
    // a NULL source is a real corpus partition: it must draw
    // defaultWeight and keep its share, not vanish at rate 0 (ADVICE r7)
    val docs = Seq((0L, Some("a"), 100L), (1L, None, 100L), (2L, None, 100L))
      .toDF("doc_id", "source", "tokens")
    val kept = Packing.sampleMixture(docs, "source", "doc_id", col("tokens"),
        Map.empty, defaultWeight = 1L, targetTokens = 1000000L)
      .select("doc_id", "keep_rate").as[(Long, Long)].collect().toMap
    assert(kept.values.forall(_ === 1000L), s"all rates cap at keep-all: $kept")
    assert(kept.keySet === Set(0L, 1L, 2L), "null-source docs must survive")
    // a null prio must fail loudly, not bin at priority 0
    val bad = Seq((0L, Some(1L), 10L), (1L, None, 10L))
      .toDF("doc_id", "prio", "tokens")
    val e = intercept[IllegalArgumentException] {
      Packing.selectTokenBudget(bad, "prio", "tokens", "doc_id", 5L)
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("long-doc splitting conserves text and bounds every chunk") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 300L).map { id =>
      val n = 1 + rnd.nextInt(70)
      (id, (0 until n).map(i => s"w$i").mkString(" "))
    }
    val out = Packing.splitLongDocs(rows.toDF("doc_id", "text"), "text", "doc_id", 16)
      .select("doc_id", "chunk_idx", "text")
      .as[(Long, Int, String)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    rows.foreach { case (id, orig) =>
      val chunks = byDoc(id)
      // chunk indices are dense from 0
      assert(chunks.map(_._2).toSeq === chunks.indices.toSeq)
      // reassembly is the original text, token-exact
      assert(chunks.map(_._3).mkString(" ") === orig, s"doc $id")
      // every chunk but the last is exactly maxTokens
      chunks.init.foreach(c => assert(c._3.split(" ").length === 16))
      assert(chunks.last._3.split(" ").length <= 16)
    }
  }

  test("connected components agree with a local union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 300).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // local union-find truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = nodes.map(n => n -> find(n)).toMap
    // distributed result
    val got = Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === truth)
  }

  test("epochManifest: seeded deal is reproducible, seeds re-deal, packing laws hold per shard") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"),
      (col("id") % 37 + 3).as("toks"))
    def manifest(seed: String) =
      Packing.epochManifest(docs, col("doc_id"), col("toks"), seed,
        budget = 100L, shards = 8)
    val m1 = manifest("s1").collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    // bit-reproducible under the same seed
    assert(manifest("s1").collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap === m1)
    // a different seed re-deals: shard membership must move for many docs
    val m2 = manifest("s2").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = m1.count { case (id, (sh, _, _, _)) => m2(id) != sh }
    assert(moved > 500, s"different seed must re-deal shards, moved only $moved")
    // every doc appears exactly once; shards are reasonably balanced
    assert(m1.size === 2000)
    val byShard = m1.values.groupBy(_._1).view.mapValues(_.size)
    assert(byShard.size === 8 && byShard.values.min > 100, byShard.toMap.toString)
    // packing laws within each shard: positions dense from 1, offsets
    // in [0, budget), bins non-decreasing in position order
    m1.values.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.toSeq.sortBy(_._2)
      assert(ordered.map(_._2) === (1L to ordered.size.toLong))
      assert(ordered.forall(r => r._4 >= 0 && r._4 < 100))
      assert(ordered.map(_._3) === ordered.map(_._3).sorted)
    }
  }

  test("sampleTemperature: rarest group fully kept, rates monotone, sampled counts track n^alpha") {
    // group A: 10000 ids, group B: 100 ids → n_min = 100
    val docs = spark.range(0, 10100).select(col("id").as("doc_id"),
      when(col("id") < 10000, lit("A")).otherwise(lit("B")).as("g"))
    val kept = Packing.sampleTemperature(docs, col("g"), col("doc_id"), quarters = 2)
      .groupBy("g").agg(count(lit(1)).as("n"), first("rate_ppm").as("r"))
      .as[(String, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    // rate(B) = floor(sqrt(100/100)*1e6) = 1e6 → every ppm bucket < 1e6 keeps
    assert(kept("B") === ((100L, 1000000L)), "rarest group keeps everything")
    // rate(A) = floor(sqrt(100/10000)*1e6) = 100000 ppm
    assert(kept("A")._2 === 100000L)
    // n^alpha law: expected kept(A) = 10000 * 0.1 = 1000; the
    // mod-prime bucket equidistributes, so the realized count is near
    assert(kept("A")._1 > 800L && kept("A")._1 < 1200L,
      s"kept(A)=${kept("A")._1} should track sqrt scaling (~1000)")
    // invalid exponents refuse
    intercept[IllegalArgumentException] {
      Packing.sampleTemperature(docs, col("g"), col("doc_id"), quarters = 4)
    }
  }

  test("selectByTokenBudget: two-level cut equals the global running-sum definition; budget tight") {
    val docs = spark.range(0, 5000).select(col("id").as("doc_id"),
      (pmod(col("id") * 7919, lit(97)) + 3).as("toks"),
      pmod(col("id") * 131, lit(300)).as("score")) // heavy score ties
    val budget = 40000L
    val kept = Packing.selectByTokenBudget(docs, col("doc_id"), col("toks"),
        col("score"), budget, bucketWidth = 16)
      .select("doc_id").as[Long].collect().toSet
    // the textbook single-window definition
    val naive = docs
      .withColumn("run", sum(col("toks")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("run") <= budget).select("doc_id").as[Long].collect().toSet
    assert(kept === naive, "two-level rewrite must equal the global definition")
    // budget is respected and tight: kept tokens ≤ budget, and the
    // next doc in priority order would push past it
    val tokOf = docs.select("doc_id", "toks").as[(Long, Long)].collect().toMap
    val total = kept.toSeq.map(tokOf).sum
    assert(total <= budget)
    val ordered = docs.select("doc_id", "toks", "score")
      .as[(Long, Long, Long)].collect()
      .sortBy(t => (-t._3, t._1))
    val firstDropped = ordered.find(t => !kept.contains(t._1)).get
    assert(total + firstDropped._2 > budget, "greedy cut must be tight")
  }

  test("mixtureInterleave: every prefix holds each source near its quota; conservation; determinism") {
    // heavily skewed mix: 1000 / 100 / 10
    val docs = spark.range(0, 1110).select(col("id").as("doc_id"),
      when(col("id") < 1000, lit("A"))
        .when(col("id") < 1100, lit("B")).otherwise(lit("C")).as("src"))
    val sched = Packing.mixtureInterleave(docs, col("src"), col("doc_id"))
      .select($"source", $"doc_id", $"k", $"stride_key")
      .as[(String, Long, Long, Long)].collect()
      .sortBy(t => (t._4, t._1, t._3))
    assert(sched.length === 1110 && sched.map(_._2).toSet.size === 1110,
      "every doc scheduled exactly once")
    // stride-scheduling balance: in EVERY prefix, each source's count
    // stays within 2 of its proportional quota
    val weights = Map("A" -> 1000.0, "B" -> 100.0, "C" -> 10.0)
    val total = 1110.0
    val counts = scala.collection.mutable.Map("A" -> 0, "B" -> 0, "C" -> 0)
    sched.zipWithIndex.foreach { case ((s, _, _, _), i) =>
      counts(s) += 1
      val p = i + 1
      weights.foreach { case (src, w) =>
        val quota = p * w / total
        assert(math.abs(counts(src) - quota) <= 2.0,
          s"prefix $p: $src has ${counts(src)} vs quota $quota")
      }
    }
    // determinism: a second run is byte-identical
    val again = Packing.mixtureInterleave(docs, col("src"), col("doc_id"))
      .select($"source", $"doc_id", $"k", $"stride_key")
      .as[(String, Long, Long, Long)].collect()
      .sortBy(t => (t._4, t._1, t._3))
    assert(again.toSeq === sched.toSeq)
  }

  test("materializePositions: equals the global-window row_number with NO WindowExec in the plan") {
    val df = spark.range(0, 50000).select(col("id").as("doc_id"),
      pmod(col("id") * 7919, lit(1000)).as("key")) // heavy ties
    val order = Seq(col("key"), col("doc_id")) // total order via tiebreak
    val out = Packing.materializePositions(df, order, partitions = 16)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "the two-pass form must not plan a WindowExec")
    val got = out.select("doc_id", "pos").as[(Long, Long)].collect().toMap
    // the textbook definition
    val expect = df.withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(got === expect, "two-pass positions must equal the global window")
    // permutation law (also pins monotonically_increasing_id's
    // consecutive-within-partition contract this relies on)
    assert(got.values.toSeq.sorted === (0L until 50000L))
  }

  test("lengthBucketedBatches: partition laws, batch sizing, and pad-waste dominance over random batching") {
    val docs = spark.range(0, 3000).select(col("id").as("doc_id"),
      (pmod(col("id") * 131, lit(480)) + 20).as("len"))
    val batches = Packing.lengthBucketedBatches(docs, col("len"), 32, 4)
      .select($"shard", $"batch", $"n_docs", $"min_toks", $"max_toks",
        $"sum_toks", $"pad_waste")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // conservation: every doc lands in exactly one batch
    assert(batches.map(_._3).sum === 3000L)
    assert(batches.map(_._6).sum ===
      docs.agg(sum("len")).as[Long].collect()(0))
    // every batch is full except possibly the last per shard
    batches.groupBy(_._1).foreach { case (sh, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2) === ordered.indices.map(_.toLong),
        s"shard $sh batches not dense")
      assert(ordered.init.forall(_._3 === 32L), s"shard $sh has a short non-final batch")
    }
    // pad-waste arithmetic holds row by row
    assert(batches.forall(b => b._7 === b._3 * b._5 - b._6))
    // length-sorted batching must beat doc_id-ordered batching on waste
    val naive = spark.range(0, 3000).select(col("id").as("doc_id"),
        (pmod(col("id") * 131, lit(480)) + 20).as("len"),
        pmod(col("id"), lit(4)).as("shard"),
        expr("cast((id div 4) div 32 as bigint)").as("batch"))
      .groupBy("shard", "batch")
      .agg((count(lit(1)) * max("len") - sum("len")).as("waste"))
      .agg(sum("waste")).as[Long].collect()(0)
    val sorted = batches.map(_._7).sum
    assert(sorted < naive / 4,
      s"length-sorted waste $sorted should be well under naive $naive")
  }
}
