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
    val terms = queries.flatMap(_._2).distinct
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query", "term")

    val base = docs.select(docId.as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    // postings of the queried terms ONLY — the explode is map-side
    // work and the filter cuts the stream before the tf shuffle
    val tf = base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val stats = base.agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))

    val avgdl = col("sum_dl").cast("double") / col("n").cast("double")
    val idf = (col("n").cast("double") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5))
    val den = col("tf") + lit(1.2) *
      (lit(0.25) + lit(0.75) * col("dl") / avgdl)
    val contrib = tf.join(broadcast(dfr), "term").join(broadcast(qterms), "term")
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
}
