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
}
