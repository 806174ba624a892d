package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM-data pipeline (SURVEY.md §2
  * C8–C11): language ID, quality scoring, token counting, document
  * fingerprinting. All pure `Column` expressions (whole-stage
  * codegen, no UDFs) — at 100 TB these are embarrassingly parallel
  * map work, so the only scale concern is staying inside codegen and
  * pruning to the `text` column at the scan.
  */
object TextAnalysis {

  /** Single-space tokenization — matches the corpus format (and the
    * DuckDB oracle's string_split(text, ' ') exactly).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, single
    * non-alphanumeric marks.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deterministic and oracle-portable; real
    * deployments would swap in larger lists (the operator shape is
    * what matters).
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** All per-language stopword counts in one tokenize pass (native
    * StopwordScores expression — the filter/isin HOF form
    * re-tokenized per language and ran interpreted per element).
    */
  private def allStopScores(text: Column): Column =
    graft.functions.TextExpressions.stopwordScores(text, Stopwords.map(_._2))

  private def stopCount(text: Column, langIdx: Int): Column =
    allStopScores(text).getItem(langIdx)

  /** Language ID: per-language stopword hit count; argmax with a
    * fixed precedence (list order) on ties; no hits at all → "und".
    */
  def langId(text: Column): Column = {
    val scoresArr = allStopScores(text)
    val scores = Stopwords.zipWithIndex.map { case ((l, _), i) => l -> scoresArr.getItem(i) }
    // strictly-greater chain in fixed order = deterministic argmax
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl: Column, bs: Column), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  val PunctPattern = "[.,!?;:]"

  /** Quality metrics: length, token count, punctuation count,
    * stopword count (en), and a deterministic composite score.
    */
  def qualityMetrics(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    val punctN = size(regexp_extract_all(text, lit(PunctPattern), lit(0)))
    val stopN = stopCount(text, 0) // index 0 = "en"
    df.withColumn("n_chars_m", length(text))
      .withColumn("n_tokens", nTok)
      .withColumn("punct_n", punctN)
      .withColumn("stop_n", stopN)
      // int/int division in double is IEEE-exact per row; round(…,6)
      // guards nothing here but keeps the export canonical.
      .withColumn("quality_score",
        round(col("stop_n") / col("n_tokens") + lit(1.0) / (lit(1.0) + col("punct_n")), 6))
  }

  /** Gopher-style repetition signals (the quality filters a pretrain
    * corpus applies before training — Rae et al. 2021 §A1.2 shape,
    * re-expressed on word n-grams since this corpus is single-line):
    *
    *  - dup_word_frac:    1 − |distinct tokens| / |tokens|
    *  - dup_trigram_frac: fraction of word trigrams occurring > once
    *  - top_bigram_frac:  occurrences of the most frequent word
    *                      bigram / total bigrams
    *
    * Scale shape: the two duplicate fractions are pure per-row
    * expressions (array_distinct over a doc-bounded array — no
    * shuffle at all); the top-bigram multiplicity is an explode →
    * (doc, bigram) count → per-doc max — two hash aggregations with
    * map-side combine, never a per-doc O(n²) lambda, so it holds at
    * any corpus size. Docs with < 2 tokens get 0.0 fractions for the
    * degenerate n-gram denominators.
    */
  def repetitionSignals(docs: DataFrame, text: Column = col("text")): DataFrame = {
    // r15: the gram-array kernels (distinct-trigram per row, bigram
    // explode+count) ran as chained single-task jobs on the
    // one-row-group scan (JobProbe: 0.6 + 0.3 + 0.4 s serial) — spread
    // the tokenized rows by input size; both consumers reuse the one
    // exchange.
    val toks = Spread.byBytes(docs.select(col("doc_id"), tokens(text).as("toks")),
      64L << 10)
    def grams(n: Int): String =
      s"""CASE WHEN size(toks) < $n THEN array()
         |ELSE transform(sequence(0, size(toks) - $n),
         |  i -> ${(0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")")})
         |END""".stripMargin
    val perRow = toks.select(col("doc_id"), col("toks"),
      expr(grams(3)).as("tg"))
      .select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
          / size(col("toks")), 6).as("dup_word_frac"),
        when(size(col("tg")) === 0, lit(0.0))
          .otherwise(round(lit(1.0) - size(array_distinct(col("tg"))).cast("double")
            / size(col("tg")), 6)).as("dup_trigram_frac"))
    val topBigram = toks
      .select(col("doc_id"), explode(expr(grams(2))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_bigram_frac"))
    perRow.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_word_frac"), col("dup_trigram_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Decontamination screen (the step between crawling and training:
    * drop corpus docs that leak the eval set): flag every corpus doc
    * sharing at least one word n-gram with any benchmark doc, with
    * the count of distinct overlapping n-grams as evidence. n = 8 is
    * the common contamination window (long enough that chance
    * collisions vanish).
    *
    * Scale shape: both sides explode to (doc, n-gram) via the native
    * single-pass WordShingles expression; the benchmark side
    * de-dups to its distinct gram set (benchmarks are tiny next to
    * the corpus — AQE broadcasts it); the join is a hash join on the
    * gram, then a per-doc count with map-side combine. Production
    * would join on a 64-bit gram hash to cut shuffle width — raw
    * strings here keep the oracle exact.
    */
  def benchmarkOverlap(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      text: Column = col("text")): DataFrame = {
    def grams(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.functions.TextExpressions.wordShingles(text, n)).as("gram"))
    val bg = grams(benchmark).select("gram").distinct()
    grams(corpus).join(bg, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_overlap"))
  }

  /** benchmarkOverlap with a Bloom pre-filter on the corpus side —
    * the 100 TB shape of the same screen. The exploded corpus grams
    * are the dominant shuffle (≈ tokens-per-doc × corpus rows);
    * probing a filter built over the benchmark's distinct grams
    * INSIDE the corpus scan stage drops the ≥ (1 − fpp) clean
    * majority before the exchange, so shuffle volume tracks the
    * contamination rate instead of the corpus size. The exact hash
    * join that follows removes the filter's false positives — the
    * result is bit-identical to [[benchmarkOverlap]] (both run
    * against the same DuckDB oracle).
    *
    * `expectedGrams` sizes the filter; when absent the benchmark
    * side is counted first (one extra action over the SMALL side —
    * a production pipeline passes the known benchmark size).
    */
  def benchmarkOverlapBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      text: Column = col("text"), fpp: Double = 0.01,
      expectedGrams: Option[Long] = None): DataFrame = {
    def grams(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.functions.TextExpressions.wordShingles(text, n)).as("gram"))
    val bg = grams(benchmark).select("gram").distinct()
    val nGrams = math.max(expectedGrams.getOrElse(bg.count()), 1L)
    val filter = bg.stat.bloomFilter("gram", nGrams, fpp)
    // r15: the corpus-side shingle explode + bloom probe ran in the
    // single scan task of the one-row-group input — spread by input
    // size (at production sizes this is a full-parallelism spread;
    // see Spread.byBytes).
    grams(graft.ops.Spread.byBytes(corpus, 64L << 10))
      .filter(graft.functions.BloomMightContain(col("gram"), filter))
      .join(bg, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_overlap"))
  }

  /** End-to-end quality gate (SURVEY.md §2 C31): the kept corpus
    * after language/length/quality/repetition screening — the
    * materialization a training run actually reads, with every signal
    * retained as provenance. ALL signals here are per-row expressions
    * (language ID, stopword quality score, duplicate-word fraction),
    * so the whole gate is ONE codegen'd projection + filter on the
    * corpus scan: zero shuffle, zero joins, embarrassingly parallel at
    * any corpus size. (The shuffle-bearing signals — top-bigram
    * coverage, dup-trigram — stay in [[repetitionSignals]] for
    * pipelines that want them; this gate is the cheap first pass that
    * drops the bulk.)
    */
  def qualityFilter(docs: DataFrame, minTokens: Int = 20,
      maxDupWordFrac: Double = 0.5, minQuality: Double = 1.05,
      text: Column = col("text")): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    val punctN = size(regexp_extract_all(text, lit(PunctPattern), lit(0)))
    val qscore = round(stopCount(text, 0) / nTok + lit(1.0) / (lit(1.0) + punctN), 6)
    val dupFrac = round(lit(1.0) - size(array_distinct(toks)).cast("double") / nTok, 6)
    docs.select(col("doc_id"), nTok.as("n_tokens"), qscore.as("quality_score"),
        dupFrac.as("dup_word_frac"), langId(text).as("lang_pred"))
      .filter(col("n_tokens") >= minTokens && col("dup_word_frac") <= maxDupWordFrac &&
        col("quality_score") >= minQuality && col("lang_pred") =!= "und")
  }

  /** Gopher-style explicit rule screen (SURVEY.md §2 C77 — the
    * per-rule document filter of Rae et al. 2021 §A1.1 / RefinedWeb
    * §3.1, distinct from [[qualityMetrics]]' numeric signals and
    * [[qualityFilter]]'s composite gate): each rule is a named
    * BOOLEAN column so a pipeline can audit WHICH rule dropped a
    * document — the operational difference between a filter you can
    * tune and one you can only rerun.
    *
    * Rules (all integer-exact — ratio thresholds are cross-multiplied
    * so no float division enters the keep decision):
    *  - word_count:    minWords ≤ |tokens| ≤ maxWords
    *  - mean_word_len: minMeanLen ≤ (non-space chars)/|tokens| ≤
    *                   maxMeanLen, as bounds·n ≤ wlen comparisons
    *  - symbol_ratio:  ('#' + '…'-as-'...') occurrences < 10% of
    *                   tokens, as 10·symbols < n
    *  - alpha_words:   ≥ 80% of tokens contain an ASCII letter,
    *                   as 5·alpha ≥ 4·n
    *  - stopwords:     ≥ minStops DISTINCT English stopwords present
    *                   (the cheap lang/coherence proxy)
    *
    * Scale shape: every rule is a per-row codegen'd expression over
    * the tokenize the scan already pays — ONE pass, zero shuffle,
    * embarrassingly parallel at any corpus size. Total word length is
    * `length(replace(text, " ", ""))` — the sum of token lengths
    * without a per-element lambda fold.
    */
  def gopherRules(docs: DataFrame, text: Column = col("text"),
      minWords: Int = 15, maxWords: Int = 1000,
      minMeanLen: Int = 3, maxMeanLen: Int = 5,
      minStops: Int = 1): DataFrame = {
    val toks = tokens(text)
    val n = size(toks)
    val wlen = length(regexp_replace(text, lit(" "), lit("")))
    val nHash = length(text) - length(regexp_replace(text, lit("#"), lit("")))
    val nEll = (length(text) - length(regexp_replace(text, lit("\\.\\.\\."), lit("")))) / lit(3)
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]")))
    val stops = Stopwords.head._2 // en
    val nStop = size(array_intersect(split(lower(text), " "), array(stops.map(lit): _*)))
    val rWord = n >= lit(minWords) && n <= lit(maxWords)
    val rMean = lit(minMeanLen) * n <= wlen && wlen <= lit(maxMeanLen) * n
    val rSym = lit(10) * (nHash + nEll) < n
    val rAlpha = lit(5) * nAlpha >= lit(4) * n
    val rStop = nStop >= lit(minStops)
    docs.select(col("doc_id"), n.as("n_words"), wlen.as("sum_word_len"),
      rWord.as("r_word_count"), rMean.as("r_mean_word_len"),
      rSym.as("r_symbol_ratio"), rAlpha.as("r_alpha_words"),
      rStop.as("r_stopwords"),
      (rWord && rMean && rSym && rAlpha && rStop).as("kept"))
  }

  /** Readability scoring (SURVEY.md §2 C78 — the Flesch reading-ease /
    * Flesch–Kincaid grade-level pair every curation pipeline uses as a
    * difficulty prior for curriculum ordering and audience bucketing):
    * sentence count = maximal `[.!?]+` runs, syllable proxy = maximal
    * vowel-group runs (the standard cheap approximation — exact
    * hyphenation needs a dictionary; the proxy is deterministic and
    * engine-portable), and both scores kept as MILLI-scaled integers
    * with truncating DIV so the famous float coefficients (206.835,
    * 1.015, 84.6 / 0.39, 11.8, 15.59) become exact integer arithmetic:
    * fre_milli  = 206835 − 1015·w DIV s − 84600·y DIV w
    * fkgl_milli = 390·w DIV s + 11800·y DIV w − 15590.
    * All three counts clamp to ≥1 so degenerate rows score instead of
    * dividing by zero. `band` buckets fre_milli at the conventional
    * 90/60/30 cut points.
    *
    * Scale shape: two regexp_extract_all passes + one split over the
    * scan — per-row codegen'd projection, zero shuffle, embarrassingly
    * parallel at any corpus size.
    */
  def readability(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val w = greatest(size(tokens(text)), lit(1)).cast("long")
    val s = greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1)).cast("long")
    val y = greatest(size(regexp_extract_all(text, lit("[aeiouAEIOU]+"), lit(0))), lit(1)).cast("long")
    docs.select(col("doc_id"), w.as("n_words"), s.as("n_sentences"),
        y.as("n_syllables"))
      .withColumn("fre_milli",
        expr("206835L - (1015L * n_words) DIV n_sentences - (84600L * n_syllables) DIV n_words"))
      .withColumn("fkgl_milli",
        expr("(390L * n_words) DIV n_sentences + (11800L * n_syllables) DIV n_words - 15590L"))
      .withColumn("band",
        when(col("fre_milli") >= 90000L, "very_easy")
          .when(col("fre_milli") >= 60000L, "plain")
          .when(col("fre_milli") >= 30000L, "difficult")
          .otherwise("very_difficult"))
  }

  /** Checksum-validated card-number redaction (SURVEY.md §2 C80 —
    * PII v2, the precision upgrade over C17's pattern scrub): a bare
    * `[0-9]{13,19}` regex over a web corpus redacts order numbers,
    * tracking codes, and timestamps wholesale; real payment-card PANs
    * are separable because they carry a Luhn check digit. This op
    * extracts every MAXIMAL digit run, keeps runs of card length
    * (13–19) as candidates, validates each with the Luhn mod-10
    * checksum, and rewrites the text with ONLY the validated runs
    * masked — per-rule counts retained as audit columns (the C77
    * discipline: a redactor you can tune, not just rerun).
    *
    * Luhn, integer-exact: digit i (1-based from the left, length n)
    * contributes d if (n−i) is even, else 2d−9·[d≥5]; valid iff the
    * sum ≡ 0 (mod 10). Entirely codegen'd HOFs — regexp_extract_all →
    * filter → nested aggregate over `sequence(1, n)` — per-row work ∝
    * text length, zero shuffle, no UDF.
    */
  def luhnScrub(docs: DataFrame, text: Column = col("text"),
      mask: String = "[CARD]"): DataFrame = {
    def luhnOk(r: Column): Column = {
      val n = length(r)
      val s = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
        val d = r.substr(i, lit(1)).cast("int")
        acc + when((n - i) % 2 === 0, d)
          .otherwise(lit(2) * d - when(d >= 5, 9).otherwise(0))
      })
      s % 10 === 0
    }
    val runs = regexp_extract_all(text, lit("[0-9]+"), lit(0))
    val cand = filter(runs, r => length(r) >= 13 && length(r) <= 19)
    val valid = filter(cand, r => luhnOk(r))
    docs
      .withColumn("n_digit_runs", size(runs).cast("long"))
      .withColumn("n_candidates", size(cand).cast("long"))
      .withColumn("valid_runs", valid)
      .withColumn("n_valid", size(col("valid_runs")).cast("long"))
      .withColumn("redacted",
        aggregate(col("valid_runs"), text, (acc, r) => replace(acc, r, lit(mask))))
      .drop("valid_runs")
  }

  /** Cross-source n-gram duplication matrix (SURVEY.md §2 C81 — the
    * corpus-provenance audit BETWEEN sources, where C24/C25 screen a
    * corpus against an external benchmark and C38/C55 find spans
    * within documents: "which of my crawl sources are republishing
    * each other", the signal behind source-level dedup priority and
    * license-contamination triage): per source, the DISTINCT set of
    * word n-grams; per source PAIR, how many n-grams they share, with
    * overlap_ppm = shared·10⁶ DIV min(|A|,|B|) (containment of the
    * smaller side — a tiny mirror inside a huge crawl still scores
    * high, which is the point).
    *
    * Scale shape: postings-shaped — one tokenize+explode ∝ corpus
    * tokens, a distinct keyed on (source, gram), then a self-join ON
    * THE GRAM (shuffle ∝ distinct postings; per-gram work is
    * |sources sharing it|², bounded by the source count, never
    * documents²); totals broadcast back onto the |pairs| matrix.
    */
  def crossSourceNgramOverlap(docs: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val slots = (0 until n).map(j => s"toks[i + $j]").mkString(", ")
    val grams = docs.select(col("source"), tokens(col("text")).as("toks"))
      .select(col("source"), explode(expr(
        s"""CASE WHEN size(toks) < $n THEN array()
           |ELSE transform(sequence(0, size(toks) - $n),
           |  i -> concat_ws(' ', $slots)) END""".stripMargin)).as("gram"))
      .distinct()
    val totals = grams.groupBy("source").agg(count(lit(1)).as("n_grams"))
    grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.select(col("source").as("src_a"),
        col("n_grams").as("n_a"))), "src_a")
      .join(broadcast(totals.select(col("source").as("src_b"),
        col("n_grams").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        expr("n_shared * 1000000L DIV least(n_a, n_b)").as("overlap_ppm"))
  }

  /** End-to-end decontamination: the *filtered corpus* — every corpus
    * doc whose distinct-overlapping-n-gram count against the benchmark
    * is ≤ `maxOverlap`, with that count kept as provenance
    * (`n_overlap` = 0 for untouched docs). This is the operator a
    * pipeline actually runs: [[benchmarkOverlap]]/[[benchmarkOverlapBloom]]
    * emit the evidence table; this composes it back onto the corpus
    * and drops the contaminated rows.
    *
    * Scale shape: the overlap side holds only contaminated docs — a
    * tiny fraction of the corpus by construction (that is the point of
    * the screen) — so the left join back is a broadcast against the
    * corpus scan; no corpus-sized shuffle is added on top of the
    * Bloom-pruned gram join inside [[benchmarkOverlapBloom]].
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      maxOverlap: Long = 0L, text: Column = col("text"), fpp: Double = 0.01,
      expectedGrams: Option[Long] = None): DataFrame = {
    val overlap =
      benchmarkOverlapBloom(corpus, benchmark, n, text, fpp, expectedGrams)
    corpus.join(broadcast(overlap), Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .filter(col("n_overlap") <= maxOverlap)
  }

  /** Corpus heavy hitters: tokens whose exact count ≥ `minCount`,
    * with a count-min-sketch map-side prune (SURVEY.md §2 C27).
    *
    * The naive form shuffles every (token, 1) to the count exchange —
    * vocabulary-sized at best, corpus-sized before combine. Here a
    * one-pass CMS (driver-merged, ε/δ-sized) is probed INSIDE the
    * token scan: `estimate < minCount` proves the true count is below
    * threshold (CMS never underestimates), so only candidate tokens
    * reach the exact count, whose HAVING then drops the sketch's
    * overestimates. Same sketch-proposes/exact-disposes contract as
    * the Bloom screen — results are bit-identical to the unfiltered
    * aggregation, and the shuffle tracks the number of frequent
    * tokens, not the corpus.
    */
  def heavyHitters(docs: DataFrame, minCount: Long, eps: Double = 0.0001,
      confidence: Double = 0.99, text: Column = col("text")): DataFrame = {
    val toks = docs.select(explode(tokens(text)).as("tok"))
    val sketch = toks.stat.countMinSketch("tok", eps, confidence, seed = 42)
    toks
      .filter(graft.functions.CmsEstimate(col("tok"), sketch) >= minCount)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Character codes of `text`, in order. */
  /** Char-n-gram LM quality scoring (C39) — the CCNet/KenLM-style
    * filter between crawling and training: score each document by how
    * surprising its character sequence is under a corpus-wide n-gram
    * model, then drop the tails (gibberish scores high, boilerplate
    * scores low). The model here IS the corpus being scored (the
    * common self-scoring setup; pass a reference corpus as `model` to
    * score against held-out counts).
    *
    * Per position i: P(cₙ | c₁..cₙ₋₁) = cg(gram) / cc(ctx), MLE over
    * the model corpus — every numerator/denominator an exact integer
    * count. Output per doc: `n_pos` positions, the exact integer
    * `sum_cg`/`sum_cc` evidence sums (hash-gateable), and the float
    * convenience `bits_per_char` = avg −log₂ P (spec-gated with
    * tolerance; float log is not cross-engine bit-stable).
    *
    * Scale shape: ONE explode of the corpus into (doc, gram)
    * positions; the model is two hash aggregations of that same
    * explode (gram counts, ctx counts — each bounded by the distinct
    * n-gram vocabulary, charset^n worst case, far below corpus size);
    * scoring joins positions to the two model tables on the gram/ctx
    * key (AQE broadcasts them when small) and finishes with one
    * per-doc hash agg with map-side combine. No windows, no
    * per-doc state. Production would join on xxhash64(gram) to cut
    * shuffle width — raw strings here keep the oracle exact (the C38
    * note).
    */
  def charLmScore(docs: DataFrame, model: Option[DataFrame] = None,
      n: Int = 3): DataFrame = {
    // r14: spread before the position explode — the corpus scans as
    // one partition (single row group) and the per-char substring
    // enumeration ran single-task (Spread).
    def positions(df: DataFrame): DataFrame = Spread(
      df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN length(text) < $n THEN array()
           |ELSE transform(sequence(1, length(text) - ${n - 1}),
           |  i -> substring(text, i, $n)) END""".stripMargin)).as("g"))
    val pos = positions(docs)
    val modelPos = model.map(positions).getOrElse(pos)
    val cg = modelPos.groupBy("g").agg(count(lit(1)).as("cg"))
    // r14 (guide §2.3/§2.4 — one fewer corpus pass, exact): every
    // position's context is the (n−1)-prefix of its gram, so
    // cc(c) = Σ_{g: prefix(g)=c} cg(g) — aggregated from the
    // gram-vocab-sized cg table instead of a SECOND corpus explode.
    // The per-gram weight table (cg ⋈ cc on the prefix, still
    // vocab-sized) then attaches in ONE probe join instead of two.
    // Identical inner-join semantics: a scored gram absent from the
    // model drops here exactly as it dropped at the old g-join (its
    // prefix row alone could never re-admit it).
    val cc = cg.groupBy(substring(col("g"), 1, n - 1).as("c"))
      .agg(sum(col("cg")).as("cc"))
    val w = cg.withColumn("c", substring(col("g"), 1, n - 1))
      .join(cc, Seq("c"))
    pos.join(w, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(col("cg")).as("sum_cg"),
        sum(col("cc")).as("sum_cc"),
        avg(log2(col("cc").cast("double") / col("cg").cast("double")))
          .as("bits_per_char"))
  }

  /** Frequency vocabulary + per-doc OOV rate (C42) — the
    * tokenizer-prep pass: the top-`k` corpus tokens by frequency
    * (rank ties broken by the token itself, so the vocabulary is
    * deterministic), and each doc's token/OOV counts against it —
    * the coverage statistic that decides whether a vocab size is big
    * enough before training a tokenizer on 100 TB.
    *
    * Scale shape: one corpus explode → token-count hash agg (output ∝
    * DISTINCT tokens, ≪ corpus) → global top-k of that vocab-sized
    * relation (the only sort, vocab-bounded) → the k-row vocabulary
    * broadcasts back onto the exploded corpus for a left join + one
    * per-doc agg with map-side combine.
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)

  def oovStats(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = vocabTopK(docs, k).select(col("tok"), lit(1).as("_in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** BPE merge-pair statistics (C43) — the inner statistic of every
    * byte-pair-encoding tokenizer training round: the frequency of
    * each ADJACENT token pair across the corpus, ranked to pick the
    * next merge. (A full BPE trainer repeats this count-then-merge
    * loop; the count is the distributed part — the merge table
    * itself is vocab-sized driver state.)
    *
    * Scale shape: one codegen'd transform(sequence) pair explode per
    * doc — no self-join of positions — into ONE hash agg keyed by
    * (a, b) with map-side combine (output ∝ distinct adjacent pairs,
    * ≪ corpus positions), then a global top-k of that pair-vocab-sized
    * relation: the only sort, bounded by distinct-pair count. Rank
    * ties break by the pair itself, so the merge choice is
    * deterministic. Production aggregates on xxhash64(a || b) to cut
    * shuffle width (the C38 note); raw strings keep the oracle exact.
    */
  def bpePairStats(docs: DataFrame, topK: Int, text: Column = col("text")): DataFrame =
    docs.select(tokens(text).as("ts"))
      .select(explode(expr(
        """CASE WHEN size(ts) < 2 THEN array()
          |ELSE transform(sequence(0, size(ts) - 2),
          |  i -> struct(ts[i] AS a, ts[i + 1] AS b)) END""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(topK)

  /** One BPE merge application (C43): rewrite every non-overlapping
    * occurrence of the adjacent pair (a, b) into the single token
    * "a+b" — left-to-right greedy, the BPE contract ("x x x" with
    * pair (x, x) becomes "x+x x", never the overlapping "x+x x+x").
    * Pure per-row map work, no shuffle; the pair is the winner
    * `bpePairStats` picked (vocab-sized driver state, like a config).
    *
    * Construction is plain `replace`, not regex, so it is codegen'd
    * AND engine-portable (no lookbehind — RE2-based engines lack it):
    * doubling the inter-token spaces gives every token its own
    * private boundary spaces, so replacing " a  b " with " a+b "
    * consumes no neighbor's boundary — each adjacent occurrence
    * matches independently while string replace's native
    * left-to-right non-overlap gives exactly BPE's greedy pairing.
    * A final collapse of the space runs restores the single-space
    * token stream.
    */
  def applyBpeMerge(text: Column, a: String, b: String): Column = {
    val spread = concat(lit(" "), replace(text, lit(" "), lit("  ")), lit(" "))
    val merged = replace(spread, lit(s" $a  $b "), lit(s" $a+$b "))
    trim(regexp_replace(merged, " +", " "))
  }

  /** Sentence segmentation (SURVEY.md §2 C83 — the pre-pass under
    * sentence-level dedup, chunk-boundary snapping, and per-sentence
    * quality scoring; C72's chunker cuts at TOKEN offsets, this cuts
    * at linguistic boundaries): a sentence is a maximal run of
    * non-terminator characters plus its trailing `[.!?]+` run —
    * expressed as ONE `regexp_extract_all(text, '[^.!?]+[.!?]*')`
    * (RE2-safe: no lookbehind, so the same pattern runs on every
    * engine), trimmed, empties dropped, exploded WITH ORDINALITY so
    * each sentence keeps its 0-based position. A terminator-free
    * document is one sentence — the honest fallback.
    *
    * Scale shape: per-row regexp + shuffle-free row expansion ∝
    * output sentences (posexplode), all codegen'd.
    */
  /** Bigram next-token conditional table (C118): for every context
    * token seen ≥ `minCtx` times as a bigram left side, the most
    * frequent continuation with its count, the context total, and the
    * conditional probability in exact ppm — the table a speculative-
    * decoding drafter or an n-gram smoothing baseline is built from
    * (C43 ranks pairs GLOBALLY to pick a merge; this is the
    * per-context conditional distribution's argmax).
    *
    * Scale shape: explode ∝ corpus tokens feeding TWO hash
    * aggregations, both with map-side partial combine — no window, no
    * join, no sort until the caller's orderBy. The argmax is ONE
    * `min(struct(-count, token))` (count DESC, token ASC — total
    * order, so ties are deterministic) instead of a row_number
    * window, keeping the second agg partial-aggregable too; output is
    * bounded by the frequent-context vocabulary, which grows
    * sublinearly in corpus size.
    */
  /** Lowercased bigram pair counts — the shared base relation of the
    * C118 conditional table and the C120 Kneser–Ney statistics: one
    * tokenize+explode pass into one hash agg keyed by (w1, w2),
    * map-side combined; output ∝ distinct adjacent pairs.
    */
  def bigramCounts(docs: DataFrame, text: Column = col("text")): DataFrame =
    bigramPositions(docs, text)
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("pair_n"))

  /** Per-document adjacent-bigram positions (doc_id, w1, w2) — one
    * codegen'd transform(sequence) explode, multiset (a repeated
    * bigram appears once per occurrence). Shared by the corpus pair
    * counts above and the C122 per-doc scorer below.
    */
  def bigramPositions(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(col("doc_id"), tokens(lower(text)).as("ts"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ts) < 2 THEN array()
          |ELSE transform(sequence(0, size(ts) - 2),
          |  i -> struct(ts[i] AS w1, ts[i + 1] AS w2)) END""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  def bigramNextTable(docs: DataFrame, minCtx: Long,
      text: Column = col("text")): DataFrame =
    bigramCounts(docs, text)
      .withColumnRenamed("w1", "context")
      .groupBy("context")
      .agg(sum(col("pair_n")).as("ctx_n"),
        min(struct((-col("pair_n")).as("negn"), col("w2").as("w2"))).as("top"))
      .filter(col("ctx_n") >= minCtx)
      .select(col("context"), col("top.w2").as("top_next"),
        (-col("top.negn")).as("top_n"), col("ctx_n"),
        expr("(0 - top.negn) * 1000000L div ctx_n").as("prob_ppm"))

  /** Kneser–Ney bigram statistics (C120): for every context with
    * count ≥ `minCtx`, the continuation-count tables KN interpolation
    * is built from — c(w1,w2*) for the argmax continuation, c(w1),
    * N1+(w1·) (distinct continuations — the discount mass source),
    * N1+(·w2*) (distinct PREDECESSORS of the top continuation — KN's
    * insight: "how novel is this word's context set", not "how
    * frequent is the word") — plus the interpolated probability at
    * absolute discount D = 3/4 in a pinned exact-floor integer form:
    *
    *   kn_ppm = ((4·c12 − 3)·10⁶) div (4·c1)
    *          + (3·n_cont·((n_pred·10⁶) div n_big)) div (4·c1)
    *
    * (≤ 2 ppm below real-valued KN from the two floors — the nested
    * form is chosen for Long headroom: the inner quotient is ≤ 10⁶,
    * so the second term is bounded by 750 000 regardless of corpus
    * size, and the first by 10⁶ · 4c12/4c1 ≤ 10⁶.)
    *
    * Scale shape: THREE hash aggs over the shared pair-count relation
    * (by w1 for context totals + argmax, by w2 for predecessor
    * counts, one global for N1+(··)), one join of the minCtx-filtered
    * context table against the vocab-sized predecessor table, the
    * 1-row global broadcast — no windows, everything map-side
    * partial-aggregable.
    */
  def kneserNeyTable(docs: DataFrame, minCtx: Long,
      text: Column = col("text")): DataFrame = {
    // three consumers (by-w1, by-w2, global) — materialize the
    // pair-count relation ONCE (∝ distinct bigrams, corpus-sublinear)
    // instead of re-running the corpus tokenize+explode+agg per
    // consumer (the C104 recompute-amplification lesson)
    val pairs = bigramCounts(docs, text).localCheckpoint(true)
    val byCtx = pairs
      .groupBy(col("w1").as("context"))
      .agg(sum(col("pair_n")).as("c1"),
        count(lit(1)).as("n_cont"),
        min(struct((-col("pair_n")).as("negn"), col("w2").as("w2"))).as("top"))
      .filter(col("c1") >= minCtx)
    val pred = pairs.groupBy(col("w2").as("top_next"))
      .agg(count(lit(1)).as("n_pred"))
    val nBig = pairs.agg(count(lit(1)).as("n_big"))
    byCtx
      .select(col("context"), col("top.w2").as("top_next"),
        (-col("top.negn")).as("c12"), col("c1"), col("n_cont"))
      .join(pred, Seq("top_next"))
      .crossJoin(broadcast(nBig))
      .select(col("context"), col("top_next"), col("c12"), col("c1"),
        col("n_cont"), col("n_pred"), col("n_big"),
        expr("""((4L * c12 - 3L) * 1000000L) div (4L * c1) +
                (3L * n_cont * ((n_pred * 1000000L) div n_big)) div (4L * c1)""")
          .as("kn_ppm"))
  }

  /** Per-document Kneser–Ney bigram scoring (C122) — the CCNet-style
    * quality filter the C120 table exists FOR: score every document's
    * bigram stream against the corpus-wide KN-smoothed model, so docs
    * whose word transitions are corpus-typical score high and
    * gibberish / shuffled / machine-mangled text scores low (C39 is
    * the character-n-gram version of the same idea; this is the
    * word-bigram one, and the smoothing means rare-but-real
    * continuations keep the discount mass instead of scoring zero).
    *
    * Self-scoring (model = corpus being scored), so every doc bigram
    * exists in the pair table and the joins are inner and lossless;
    * docs with < 2 tokens have no bigrams and drop from the output —
    * the C39 contract (`n_pos` there, `n_bigrams` here, counts what
    * was scorable).
    *
    * Integers all the way (the C39 evidence-sum discipline): each
    * bigram's probability is the C120 pinned exact-floor `kn_ppm`
    * generalized from the argmax continuation to EVERY (w1, w2) pair,
    * and a doc exports the exact `sum_kn_ppm` / `n_bigrams` evidence
    * plus the floored `avg_kn_ppm` — hash-gateable, no floats, no
    * logs. Headroom: kn_ppm ≤ 2·10⁶ and per-DOC bigram counts bound
    * the sum, so sum_kn_ppm < 2·10⁶·doc_len — Long-safe for any doc
    * under ~4·10¹² tokens (and the pair-table headroom is C120's:
    * safe while the hottest bigram count stays under ~2.3·10¹²).
    *
    * Scale shape: the pair-count relation is computed ONCE and
    * checkpointed (three aggregate consumers — the C104 lesson); the
    * pair-level kn table is ∝ distinct bigrams (corpus-sublinear),
    * built from two vocab-sized joins + the 1-row broadcast; scoring
    * is ONE shuffle of the doc-bigram stream on (w1, w2) into the
    * pair table (AQE broadcasts it when small) and one per-doc hash
    * agg with map-side combine. No windows.
    */
  def knPplScores(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val pairs = bigramCounts(docs, text).localCheckpoint(true)
    val ctx = pairs.groupBy("w1")
      .agg(sum(col("pair_n")).as("c1"), count(lit(1)).as("n_cont"))
    val pred = pairs.groupBy("w2").agg(count(lit(1)).as("n_pred"))
    val nBig = pairs.agg(count(lit(1)).as("n_big"))
    val knPair = pairs.join(ctx, Seq("w1")).join(pred, Seq("w2"))
      .crossJoin(broadcast(nBig))
      .select(col("w1"), col("w2"),
        expr("""((4L * pair_n - 3L) * 1000000L) div (4L * c1) +
                (3L * n_cont * ((n_pred * 1000000L) div n_big)) div (4L * c1)""")
          .as("kn_ppm"))
    bigramPositions(docs, text)
      .join(knPair, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("kn_ppm")).as("sum_kn_ppm"))
      .withColumn("avg_kn_ppm", expr("sum_kn_ppm div n_bigrams"))
  }

  def segmentSentences(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(col("doc_id"), posexplode(filter(
        transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)),
          s => trim(s)),
        s => s =!= "")).as(Seq("sent_idx", "sentence")))
      .select(col("doc_id"), col("sent_idx").cast("long"), col("sentence"),
        size(tokens(col("sentence"))).cast("long").as("n_tokens"))

  /** Multi-round BPE training (SURVEY.md §2 C82 — the actual
    * tokenizer-training loop over C43's single round): `rounds`
    * iterations of count-adjacent-pairs → argmax (cnt DESC, a, b —
    * deterministic tie-break) → greedy non-overlapping merge-apply,
    * returning the MERGE TABLE [(round, a, b, cnt)] — the artifact a
    * tokenizer trainer actually ships. The merge table is vocab-sized
    * DRIVER state by design (one 1-row collect per round, like C23's
    * k-means centroids); the distributed work per round is exactly
    * C43's shapes — one pair explode ∝ corpus tokens into a hash agg
    * ∝ distinct pairs, then one codegen'd map rewrite — and the
    * corpus is localCheckpoint'ed each round so the K-deep rewrite
    * lineage never re-executes (cluster form: reliable checkpoint).
    * Total cost = K corpus passes, the textbook BPE price; stops
    * early when no adjacent pair remains.
    *
    * Invariant the laws pin: each round's merge removes one token
    * per GREEDY NON-OVERLAPPING occurrence — equal to `cnt` for
    * pairs with a ≠ b, strictly less on self-adjacent runs (the
    * statistic counts "x x x" as two (x,x) pairs, the rewrite fuses
    * one — the standard BPE count/apply asymmetry).
    */
  def bpeTrain(docs: DataFrame, rounds: Int): Seq[(Int, String, String, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // r14: spread once at entry — every round's pair explode + count
    // and merge rewrite then runs on all cores (the eager
    // localCheckpoint per round preserves the spread partitioning;
    // the one-row-group corpus otherwise pins the whole loop to one
    // task — see Spread).
    // r15: width from input size, not core count — the driver's r14
    // scaling run measured this loop 2.7× faster at 8 cores than 32
    // (tiny corpus × 6 rounds × per-partition stage overhead). 64 KB
    // of text per task keeps each merge-rewrite task ≥ tens of ms of
    // kernel work; at real corpus sizes the clamp yields full
    // parallelism (see Spread.byBytes).
    var cur = Spread.byBytes(docs.select(col("doc_id"), col("text")), 64L << 10)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= rounds && !done) {
      val top = bpePairStats(cur, 1).collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        out += ((k, r.getString(0), r.getString(1), r.getLong(2)))
        cur = cur.withColumn("text",
          applyBpeMerge(col("text"), r.getString(0), r.getString(1)))
          .localCheckpoint(true)
        k += 1
      }
    }
    out.result()
  }

  /** Per-document salient terms (C47) — the tf-idf keyword pass: each
    * doc's top-k tokens by term frequency penalized by corpus
    * document frequency. The score here is the integer-exact variant
    * `tf · 10⁹ div df` (idf' = 1/df): same "frequent here, rare
    * everywhere" ordering intent as log-idf, but every comparison is
    * integer arithmetic, so the ranking — and therefore the exported
    * top-k — is engine-exact with no float-log cross-engine drift
    * (production swaps in `tf · ln(N/df)` when interoperating with
    * existing scores; the plumbing is identical).
    *
    * Scale shape: ONE corpus explode feeding two hash aggs — (doc,
    * token) term counts and token document frequencies (∝ vocab) —
    * a key join of the two, then a per-DOC window for the top-k:
    * partitions are single documents, so window state is bounded by
    * a doc's distinct tokens, never corpus-sized.
    */
  def tfIdfTopK(docs: DataFrame, k: Int, text: Column = col("text")): DataFrame = {
    val tk = docs.select(col("doc_id"), explode(tokens(text)).as("tok"))
    val tf = tk.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tk.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val scored = tf.join(dfreq, "tok")
      .withColumn("score", expr("(tf * CAST(1000000000 AS BIGINT)) div df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"), col("score"))
  }

  /** Robust outlier trimming (C45) — drop rows whose `value` sits
    * more than `k` median-absolute-deviations from its group's
    * median: the length/size screen a curation pipeline runs per
    * language (mean/stddev screens get dragged by the very outliers
    * they hunt; median/MAD are 50%-breakdown robust).
    *
    * Exactness: medians of integers are dyadic rationals (an average
    * of two middle values), |v − med| again dyadic, and k·mad exact
    * for dyadic k — every comparison is bit-identical across engines,
    * no epsilon. Scale shape: two |groups|-row aggregates (each ONE
    * hash agg) broadcast back onto the scan; the filter is codegen'd
    * map work. The exact per-group median sorts within the aggregation
    * buffer — state ∝ group size; at 100 TB swap `median` for
    * `approx_percentile(…, 0.5)` (B20 gates that path's error bound)
    * — the trim tolerates a slightly-off center by construction.
    *
    * Returns the kept rows with `med`/`mad` attached as provenance.
    */
  def madTrim(df: DataFrame, value: Column, key: Column, k: Double = 3.0): DataFrame = {
    val meds = df.groupBy(key.as("_k")).agg(median(value).as("med"))
    val withMed = df.join(broadcast(meds), key === col("_k")).drop("_k")
    val mads = withMed.groupBy(key.as("_k"))
      .agg(median(abs(value - col("med"))).as("mad"))
    withMed.join(broadcast(mads), key === col("_k")).drop("_k")
      .filter(abs(value - col("med")) <= lit(k) * col("mad"))
  }

  /** Canonical text normalization (C44) — the first pass of every
    * text-curation pipeline: Unicode NFC composition (decomposed
    * accent sequences fold to their canonical code points, so
    * visually-identical strings hash identically downstream — exact
    * dedup, span dedup, and decontamination all depend on it),
    * optional casefold, optional whitespace-run collapse. Pure
    * per-row map work on the scan, fully codegen'd (the NFC step is
    * the custom `UnicodeNormalize` expression — Spark has none);
    * no shuffle at any corpus size.
    */
  /** HTML/markup stripping (SURVEY.md §2 C102, r10) — the first
    * transform every web-scraped corpus runs: drop comments, then
    * tags, decode the common named entities, collapse the whitespace
    * the markup left behind. Pure codegen'd regexp/replace chain —
    * zero shuffles, scales as a map. Entity decode order matters and
    * is fixed: `&amp;` LAST, so `&amp;lt;` decodes to the literal
    * `&lt;` (one level, the HTML spec's behavior), never
    * double-decodes to `<`.
    */
  def stripHtml(html: Column): Column = {
    val noComments = regexp_replace(html, "<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Encoding-damage (mojibake) screen (SURVEY.md §2 C103, r10):
    * count the two dominant real-world signatures — UTF-8 bytes
    * decoded as Latin-1 (the 'Ã¡'-class artifacts: 'Ã' followed by a
    * continuation-range char) and U+FFFD replacement characters (a
    * decoder already gave up) — and rate them per million chars.
    * One regexp count + one char count per doc, map-only at any
    * scale; the verdict threshold is the caller's.
    */
  def mojibakeStats(text: Column): (Column, Column) = (
    regexp_count(text, lit("Ã[-¿]")),
    regexp_count(text, lit("�")))

  def normalizeText(text: Column, form: String = "NFC",
      casefold: Boolean = true, collapseWs: Boolean = true): Column = {
    var t = graft.functions.TextExpressions.unicodeNormalize(text, form)
    if (casefold) t = lower(t)
    if (collapseWs) t = trim(regexp_replace(t, "\\s+", " "))
    t
  }

  /** Sliding-window document chunking (SURVEY.md §2 C72) — the
    * RAG-index / long-document-split prep: each doc cuts into
    * `chunkTokens`-token windows advancing by `strideTokens`
    * (stride < chunk ⇒ overlapping context, the retrieval-quality
    * trade every RAG pipeline tunes). Chunk count =
    * 1 + max(0, ceil((n − chunk)/stride)) — a doc shorter than one
    * chunk is still ONE chunk (nothing silently dropped), the last
    * window may run short, and every token position is covered.
    *
    * Scale shape: split + posexplode over a per-doc integer sequence,
    * all codegen'd — shuffle-free row expansion ∝ output chunks, the
    * same scan the tokenization already pays. Deterministic integer
    * boundaries, so the expansion is oracle-exact on any engine.
    */
  def chunkDocs(docs: DataFrame, idCol: Column, text: Column,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < stride <= chunk: chunk=$chunkTokens stride=$strideTokens")
    docs
      .select(idCol.as("doc_id"), tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__lastStart",
        greatest(lit(0L),
          expr(s"cast(ceil((__n - ${chunkTokens}L) / ${strideTokens}D) as long)" +
            s" * ${strideTokens}L")))
      .select(col("doc_id"), col("__toks"), col("__n").as("n_tokens"),
        posexplode(expr(s"sequence(0L, __lastStart, ${strideTokens}L)"))
          .as(Seq("chunk_idx", "start_tok")))
      .withColumn("chunk_text",
        expr(s"array_join(slice(__toks, cast(start_tok + 1 as int), $chunkTokens), ' ')"))
      .withColumn("n_chunk_toks",
        least(lit(chunkTokens.toLong), col("n_tokens") - col("start_tok")))
      .drop("__toks")
  }

  def charCodes(text: Column): Column =
    transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))).cast("long"))

  /** Rolling polynomial fingerprint over the code points:
    * h ← (h*31 + code) mod 1e9+7. Sequential — order is part of the
    * semantics (it's a *rolling* hash). Native single-pass expression;
    * the aggregate-over-charCodes composition re-sliced the string per
    * character (O(n²) per doc on the interpreted HOF path).
    */
  def fingerprint(text: Column): Column =
    graft.functions.TextExpressions.rollingHash(text)

  /** C89: chat-template / special-token leakage markers — the
    * artifacts that poison pre-training text when formatted SFT or
    * assistant transcripts leak into a web corpus. Substring probes,
    * deliberately coarse ("<|" catches every <|im_start|>-style
    * token family).
    */
  val templateMarkers: Seq[(String, String)] = Seq(
    "special" -> "<|", "inst" -> "[INST]", "heading" -> "###",
    "bos" -> "<s>", "moustache" -> "{{")

  /** C89 core: per-source leakage audit. One codegen'd projection
    * computes every marker flag per row (instr — no regex), then ONE
    * map-side-combinable hash agg to |sources| rows: per-marker doc
    * counts, any-marker count, and an integer-ppm leakage rate.
    * Scale shape: scan-bounded, report is |sources| rows.
    */
  def templateLeakage(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val flags = templateMarkers.map { case (k, m) =>
      (instr(text, m) > 0).cast("long").as(s"f_$k") }
    val anyFlag = greatest(templateMarkers.map(km => col(s"f_${km._1}")): _*)
    docs.select(col("source") +: flags: _*)
      .withColumn("f_any", anyFlag)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        templateMarkers.map { case (k, _) =>
          sum(col(s"f_$k")).as(s"n_$k") } :+
          sum(col("f_any")).as("n_flagged"): _*)
      .withColumn("flagged_ppm", expr("n_flagged * 1000000L DIV n_docs"))
  }
}
