package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary operations (SURVEY.md §2 C21):
  * document-frequency statistics and boilerplate-token pruning — the
  * "strip the tokens that appear everywhere" pass between cleaning
  * and packing.
  *
  * fit/transform shape: the common-token set is an aggregate over
  * the corpus (distributed, one shuffle on token), collected ONLY
  * because it is tiny by construction (tokens in ≥ minDocFrac of all
  * docs — bounded by 1/minDocFrac·avg_doc_len distinct values, in
  * practice dozens); removal is then a plan-time set inside a
  * single-pass native expression, so the transform is map-only — no
  * join, no shuffle, at any corpus size.
  */
object Vocab {

  /** Document frequency per distinct token. */
  def documentFrequency(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(array_distinct(split(text, " "))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))

  /** Tokens present in at least `minDocFrac` of all documents. */
  def commonTokens(docs: DataFrame, text: Column, minDocFrac: Double): Seq[String] = {
    val nDocs = docs.count()
    documentFrequency(docs, text)
      .filter(col("doc_freq") >= lit(minDocFrac) * lit(nDocs.toDouble))
      .orderBy("token")
      .collect().map(_.getString(0)).toSeq
  }

  /** Remove a fixed token set in one pass (native expression). */
  def removeTokens(text: Column, toks: Seq[String]): Column =
    graft.functions.TextExpressions.removeTokens(text, toks)

  /** Vocabulary-growth (Heaps) curve (C119): at each of `buckets`
    * corpus-prefix checkpoints in doc_id order, the exact
    * (docs, cumulative tokens, distinct tokens seen so far) triple —
    * the curve that tells a tokenizer-training / corpus-sizing run
    * whether more data still buys vocabulary (C42 is the STATIC
    * vocab + OOV readout; this is its growth over ingest order). The
    * Heaps exponent fit is left to the notebook on top — the exported
    * curve is exact integers.
    *
    * Scale shape: per-doc token counts (map-only) feed the C74
    * partition-wise prefix (the `Packing.materializePositions` shape,
    * never a global unpartitioned window): range-partition + local
    * sort by doc_id, per-partition (count, token-sum) totals collected
    * as ≤ shuffle-partitions rows, a driver prefix over THAT, then
    * per-partition rank/cumsum windows (one task per partition) plus
    * the broadcast offsets — global ranks and cumulative tokens with
    * no single-task stage anywhere. "Distinct so far" needs no
    * per-checkpoint rescan: each token reduces to its FIRST document
    * (one hash agg ∝ vocabulary), is bucketed against the broadcast
    * checkpoint thresholds in a single map-side expression, and a
    * prefix sum over the `buckets`-row histogram finishes the curve.
    * The checkpoint table itself is driver-sized config state (as the
    * BPE winner pair).
    */
  def vocabGrowthCurve(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perDoc = docs.select(col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("nt"))
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // range-partitioned local sort: doc_id ranges are disjoint and
    // ordered across partition ids, so global rank/cumsum = local
    // window value + the driver-prefixed totals of earlier partitions
    val sorted = perDoc.repartitionByRange(np, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("n"), sum(col("nt")).as("snt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nDocs = parts.iterator.map(_._2).sum
    require(nDocs >= buckets, s"need >= $buckets docs, got $nDocs")
    // checkpoint ranks c_k = (k·N) div buckets, k = 1..buckets; the
    // row at rank c_k carries the doc_id threshold + cumulative
    // tokens of the k-th prefix
    val ranks = (1 to buckets).map(k => k.toLong * nDocs / buckets)
    var (rAcc, tAcc) = (0L, 0L)
    val offs = parts.map { case (pid, n, snt) =>
      val o = (pid, rAcc, tAcc); rAcc += n; tAcc += snt; o
    }.toSeq
    val offDf = broadcast(offs.toDF("__pid", "__rn0", "__nt0"))
    val lw = Window.partitionBy("__pid").orderBy("doc_id")
    val atRanks = sorted
      .withColumn("lrn", row_number().over(lw).cast("long"))
      .withColumn("lcum",
        sum(col("nt")).over(lw.rowsBetween(Window.unboundedPreceding, 0)))
      .join(offDf, Seq("__pid"))
      .select((col("lrn") + col("__rn0")).as("rn"), col("doc_id"),
        (col("lcum") + col("__nt0")).as("cum_nt"))
      .filter(col("rn").isin(ranks.distinct: _*))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cps = ranks.zipWithIndex.map { case (rn, i) =>
      val (thr, cum) = atRanks(rn)
      (i + 1L, rn, thr, cum) // (decile, n_docs, doc_id threshold, cum_tokens)
    }
    // each token's first document, bucketed to the EARLIEST checkpoint
    // covering it: k = buckets+1 − |{thresholds ≥ first_doc}|
    // (thresholds ascending; map-side expression over the vocab agg)
    val thrLit = array(cps.map(c => lit(c._3)): _*)
    val hist = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("md"))
      .select((lit(buckets + 1L) -
        size(filter(thrLit, t => t >= col("md"))).cast("long")).as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_tokens"))
    // cumulative distinct at each checkpoint via a ≤-join over the two
    // `buckets`-row relations (carries forward over empty deciles)
    val cpsDf = cps.map(c => (c._1, c._2, c._4)).toDF("decile", "n_docs", "cum_tokens")
    cpsDf.join(hist.withColumnRenamed("decile", "hd"), col("hd") <= col("decile"))
      .groupBy("decile", "n_docs", "cum_tokens")
      .agg(sum("new_tokens").as("distinct_tokens"))
      .orderBy("decile")
  }

  /** Zipf rank–frequency + coverage curve (C123): the vocabulary
    * ranked by corpus frequency, read out at log-spaced ranks
    * (1, 2, 4, … powers of two, plus the final rank) with the exact
    * cumulative token coverage in ppm at each — the curve behind
    * every tokenizer-vocab-size decision ("how much of the corpus do
    * the top 2^k types cover?") and the empirical Zipf-exponent fit
    * (notebook work on top, as with the C119 Heaps curve — the
    * exported curve itself is exact integers; C119 is vocabulary over
    * INGEST order, this is mass over FREQUENCY order).
    *
    * Scale shape: one token hash-agg (∝ vocabulary), then the global
    * (rank, cumulative count) over the (cnt DESC, token) total order
    * via [[graft.ops.Prefix]]'s partition-wise machinery inlined with
    * a running count column — range-partition + local sort, driver
    * prefix over ≤ shuffle-partitions (count, sum) rows, local
    * windows + broadcast offsets: no single-task stage. The
    * power-of-two readout is a map-side bit test `(rank & (rank−1)) =
    * 0`, so output is ∝ log₂(vocabulary) rows. Long headroom:
    * coverage scales cumulative counts by 10⁶ — exact to ~9.2·10¹²
    * total tokens (the C120 family bound); per-source sharding splits
    * corpora beyond that.
    */
  def zipfCurve(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val vocab = docs.select(explode(split(text, " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sortKeys = Seq(col("cnt").desc, col("token"))
    val sorted = vocab.repartitionByRange(np, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sc"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nTypes = parts.iterator.map(_._2).sum
    val total = parts.iterator.map(_._3).sum
    var (rAcc, cAcc) = (0L, 0L)
    val offs = parts.map { case (pid, n, sc) =>
      val o = (pid, rAcc, cAcc); rAcc += n; cAcc += sc; o
    }.toSeq
    val offDf = broadcast(offs.toDF("__pid", "__rn0", "__c0"))
    val lw = Window.partitionBy("__pid").orderBy(sortKeys: _*)
    sorted
      .withColumn("__lrn", row_number().over(lw).cast("long"))
      .withColumn("__lcum",
        sum(col("cnt")).over(lw.rowsBetween(Window.unboundedPreceding, 0)))
      .join(offDf, Seq("__pid"))
      .select((col("__lrn") + col("__rn0")).as("rank"), col("token"),
        col("cnt"), (col("__lcum") + col("__c0")).as("cum_cnt"))
      .filter(expr("(rank & (rank - 1)) = 0") || col("rank") === lit(nTypes))
      .withColumn("coverage_ppm", expr(s"cum_cnt * 1000000L div ${total}L"))
      .orderBy("rank")
  }
}
