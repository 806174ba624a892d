package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 scored retrieval over a tokenized document corpus (C50) —
  * the ranking function behind classic sparse retrieval (Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and
  * Beyond", Found. Trends IR 2009) and the lexical half of modern
  * hybrid RAG pipelines: for a SMALL batch of term queries, score
  * every document containing a query term and keep the top-k per
  * query.
  *
  * Scale shape (the inverted-index discipline without building one):
  *  - tokens are FILTERED to the union of query terms immediately
  *    after the explode, so the only shuffle ∝ postings of the
  *    queried terms (at 100 TB: the posting lists), never the corpus
  *    token stream;
  *  - document frequencies and the query→term map are config-sized
  *    and broadcast; corpus size and total length ride a 1-row
  *    aggregate cross-joined in (never collected);
  *  - the final top-k window partitions by query — |queries| × top-k
  *    rows out.
  *
  * Exactness (this is a hash-gated operator): the IDF is the
  * LOG-FREE Robertson ratio (N − df + ½)/(df + ½) — monotone in the
  * standard log IDF, so rankings agree — because `ln` is not
  * correctly-rounded and would differ across engines in the last
  * ulp; every other factor is +,*,/ on IEEE doubles in a pinned
  * association order, which IS bit-deterministic. Per-term
  * contributions are scaled to nano-units and rounded to BIGINT
  * BEFORE the per-document sum, so the aggregation order cannot
  * perturb the total.
  */
object Retrieval {

  /** k1 = 1.2, b = 0.75 — the standard BM25 parameters. */
  def bm25TopK(docs: DataFrame, docId: Column, toks: Column,
      queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bm25TopKQueries(docs, docId, toks,
      queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
        .toDF("query", "term"), k)
  }

  /** [[bm25TopK]] with the query batch as a DATAFRAME of (query,
    * term) rows — for queries derived from data (C64's doc-anchored
    * mining) rather than a hand-written list. The query column keeps
    * its own type (string name or numeric qid). Scale shape
    * unchanged: the term filter becomes a broadcast semi-join (the
    * batch is small by the serving contract, like denseRanks'), the
    * postings shuffle still carries queried terms only. Repeated
    * (query, term) rows contribute twice — standard BM25 multiset
    * query semantics.
    */
  def bm25TopKQueries(docs: DataFrame, docId: Column, toks: Column,
      qterms: DataFrame, k: Int, spreadCorpus: Boolean = false,
      pinPostings: Boolean = false): DataFrame = {
    // r14: `spreadCorpus` spreads the tokenized corpus — a
    // single-row-group scan is one partition, so the token explode +
    // semi-join + partial tf aggregation runs single-task. Opt-in
    // from the LARGE-anchor-batch caller (mine_hard_negatives, whose
    // tf build measured 3.8 s single-task at sf0.1); the handful-of-
    // queries callers (text_bm25_topk, rrf, eval_{ndcg,mrr}) measured
    // a net TAX from the extra exchange and stay direct.
    val base0 = docs.select(docId.as("doc_id"), toks.as("toks"))
    val base = (if (spreadCorpus) Spread(base0) else base0)
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    // postings of the queried terms ONLY — the explode is map-side
    // work and the semi-join cuts the stream before the tf shuffle
    val tf0 = base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    // r15 (guide §1.2): tf feeds BOTH the df broadcast and the scoring
    // stream — without pinning, the corpus token explode + semi-join +
    // aggregation runs once per consumer. `pinPostings` materializes
    // the postings-sized tf once; opt-in from the large-anchor-batch
    // caller (mine_hard_negatives — |postings| bounded by the queried
    // terms), the handful-of-terms callers stay lazy (a checkpoint job
    // would cost more than the re-run it saves there).
    val tf = if (pinPostings) tf0.localCheckpoint(true) else tf0
    // The checkpoint pins whatever partitioning AQE coalesced the tf
    // aggregation to (bytes-tiny → ~1 partition), but the scoring join
    // below does per-posting CPU work — respread it so the heavy
    // stage keeps its parallelism (measured: 1.6 s on 2 tasks without
    // this). The df side stays direct: it is one small aggregation.
    val tfScore = if (pinPostings) Spread(tf) else tf
    val dfr = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val stats = base.agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))

    val avgdl = col("sum_dl").cast("double") / col("n").cast("double")
    val idf = (col("n").cast("double") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5))
    val den = col("tf") + lit(1.2) *
      (lit(0.25) + lit(0.75) * col("dl") / avgdl)
    val contrib = tfScore.join(broadcast(dfr), "term").join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("nano",
        round(idf * (col("tf") * lit(2.2)) / den * lit(1e9)).cast("long"))
    val scored = contrib.groupBy("query", "doc_id")
      .agg(sum("nano").as("score_nano"))
    val w = Window.partitionBy("query")
      .orderBy(col("score_nano").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query"), col("rk").cast("int").as("rk"),
        col("doc_id"), col("score_nano"))
  }

  /** Dense retrieval ranking for a SMALL query batch (C54 substrate):
    * each named query vector scores the whole corpus by cosine and
    * keeps its top-k as an explicit (query, doc_id, rk) ranked list.
    *
    * Exactness: ranks order by `round(cosine · 10⁹)` as BIGINT (plus
    * the doc_id tie-break), not by the raw double — the dot product
    * is associative-order-sensitive in its last ulp across engines,
    * and nano-rounding puts ~1e-7 of slack between the compared
    * integers, so the exported RANKS are engine-stable even where the
    * raw floats differ in the last bit.
    *
    * Scale shape: the query batch is broadcast (|queries| rows), the
    * corpus streams through one scan, and the per-query window sees
    * only corpus×|queries| scored rows partitioned by query. A
    * corpus-sized query batch belongs on [[Similarity.annLshTopK]]
    * (the C7 path) — this is the serving-time shape.
    */
  def denseRanks(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("query").as("query"),
      col("embedding").as("emb_q")))
    val c = corpus.select(col("vec_id").as("doc_id"), col("embedding").as("emb_c"))
    val scored = c.crossJoin(q)
      .select(col("query"), col("doc_id"),
        round(Similarity.cosine(col("emb_q"), col("emb_c")) * lit(1e9))
          .cast("long").as("nano_cos"))
    val w = Window.partitionBy("query")
      .orderBy(col("nano_cos").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query"), col("doc_id"), col("rk").cast("int").as("rk"))
  }

  /** Reciprocal-rank fusion (C54) — Cormack, Clarke & Buettcher,
    * "Reciprocal Rank Fusion outperforms Condorcet and individual
    * rank learning methods" (SIGIR 2009): fuse several ranked lists
    * keyed (query, doc_id, rk) by scoring each appearance
    * `1/(rrfK + rank)` and summing across systems — the standard
    * hybrid-RAG combiner for BM25 + dense lists because it needs no
    * score calibration, only ranks.
    *
    * Exactness: the per-appearance score is the INTEGER
    * `10⁹ div (rrfK + rk)` — RRF's fixed-point arithmetic is exact in
    * BIGINT, so the fused ordering (score desc, doc_id asc) is
    * engine-identical with no float anywhere.
    *
    * Scale shape: inputs are already top-k lists (|queries|·k rows
    * per system — config-sized however big the corpus was); the union
    * + hash agg + per-query window all run on that bounded relation.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val scored = rankings.map(_.select(col("query"), col("doc_id"),
      expr(s"1000000000L div (${rrfK}L + CAST(rk AS BIGINT))").as("pts")))
      .reduce(_.unionByName(_))
    val fused = scored.groupBy("query", "doc_id")
      .agg(sum("pts").as("rrf_nano"), count(lit(1)).as("n_systems"))
    val w = Window.partitionBy("query")
      .orderBy(col("rrf_nano").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query"), col("rk").cast("int").as("rk"), col("doc_id"),
        col("rrf_nano"), col("n_systems"))
  }

  /** Rank-biased overlap at depth 10, persistence p = 1/2 (SURVEY.md
    * §2 C132) between two `(query, doc_id, rk ≤ 10)` rankings —
    * Webber et al.'s top-weighted ranking similarity, exact because
    * the p = 1/2 weights are dyadic rationals: rbo =
    * Σ_d 2^(10−d)·(X_d/d)/(2^10−1) with X_d the depth-d prefix
    * overlap, and swapping the summation order turns the series into
    * ONE pinned integer weight per common doc, W(max(ra, rb)) =
    * Σ_{d≥m} 2^(10−d)·(2520/d) over the common denominator
    * 1023·2520 = 2 577 960 (2520 = lcm(1..10)). Identical rankings
    * hit exactly 10⁶ ppm; disjoint ones 0; queries with no common doc
    * still emit a 0 row (anchored on the first ranking's query set).
    * Scale: both inputs are |queries|·k relations, so the join + agg
    * are eval-sized at any corpus size.
    */
  def rbo(a: DataFrame, b: DataFrame): DataFrame = {
    val wCase = "CASE greatest(rk, rkb) WHEN 1 THEN 1788440L " +
      "WHEN 2 THEN 498200L WHEN 3 THEN 175640L WHEN 4 THEN 68120L " +
      "WHEN 5 THEN 27800L WHEN 6 THEN 11672L WHEN 7 THEN 4952L " +
      "WHEN 8 THEN 2072L WHEN 9 THEN 812L ELSE 252L END"
    // The dyadic weight table is derived FOR depth 10: a row with
    // rk > 10 would fall into the ELSE branch (the depth-10 weight)
    // and silently inflate wsum past the 10⁶-ppm ceiling. Enforce the
    // truncation here rather than trusting the caller contract
    // (ADVICE r12).
    val a10 = a.filter(col("rk") <= 10)
    val agg = a10.join(b.filter(col("rk") <= 10)
        .select(col("query"), col("doc_id"), col("rk").as("rkb")),
        Seq("query", "doc_id"))
      .groupBy("query")
      .agg(count(lit(1)).as("n_common"), sum(expr(wCase)).as("wsum"))
    a.select("query").distinct()
      .join(agg, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("wsum"), lit(0L)).as("wsum"))
      .withColumn("rbo_ppm", expr("wsum * 1000000L div 2577960L"))
  }
}
