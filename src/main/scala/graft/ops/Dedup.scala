package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{shiftL, shiftR}

/** Deduplication operators (SURVEY.md §2 C1–C5).
  *
  * Scale design: every variant reduces to "groupBy a (small) key"
  * — exact dedup groups by the text hash, MinHash/SimHash group by
  * band buckets — so shuffle keys are a few bytes per doc and
  * map-side combine collapses local duplicates before the wire. The
  * pair-expansion joins run bucket-local (the candidate space, never
  * the corpus cross product). Skew guard: buckets larger than
  * `maxBucket` are dropped (a giant bucket means a degenerate
  * band — e.g. empty docs — and would otherwise expand |B|² pairs
  * on one task; production would salt-and-resplit instead).
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct text. */
  def exact(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.groupBy(md5(text).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word w-shingles — single-pass custom expression. (The
    * transform/slice/array_join composition re-evaluates the
    * embedded split() once per shingle on the interpreted
    * HigherOrderFunction path; see TextExpressions.)
    */
  def shingles(text: Column, w: Int = 3): Column =
    graft.functions.TextExpressions.wordShingles(text, w)

  /** Bucket-local candidate pairs from a keyed relation
    * (doc_id[, payload], band, bucket): ONE BoundedCollectLongPairs
    * aggregation materializes each (band, bucket) member list —
    * sorted, capped at `maxBucket` (oversized buckets arrive as NULL
    * and are dropped: a giant bucket is a degenerate band and would
    * expand |B|² pairs) — then pairs expand locally from the array.
    * Replaces the r2 count-then-anti-join guard, which evaluated the
    * band-hash expression (the dominant per-row CPU) twice and
    * shuffled the keyed relation twice; this shape hashes each doc
    * once and ships one (band, bucket, ids) row per bucket. The pair
    * expansion is a lambda over a ≤ maxBucket array — interpreted,
    * but bounded at maxBucket²/2 tuples per bucket row, off the
    * per-doc hot path.
    */
  private[ops] def bucketPairs(keyed: DataFrame, maxBucket: Int,
      payload: Column = lit(0L), spreadExpand: Boolean = false): DataFrame = {
    // r14 (guide §2.5 — AQE sizes by BYTES and the explode below
    // multiplies them): the member-list aggregate output is tiny, so
    // AQE coalesces the reduce to one partition and the (interpreted)
    // pair-expansion lambda runs single-task. `spreadExpand` inserts a
    // bucket-row exchange before the expansion so it engages every
    // core — opt-in from the DEEP-table caller (cosinePairsLsh, whose
    // expansion measured 3.5 s single-task at sf0.1); the shallow
    // minhash/simhash paths measured a net TAX from the extra
    // exchange and stay direct. Pair sets are unchanged either way.
    val buckets = keyed.groupBy("band", "bucket")
      .agg(graft.functions.BoundedCollectLongPairs(
        col("doc_id"), payload, maxBucket).as("ms"))
      .filter(col("ms").isNotNull && size(col("ms")) >= 2)
    (if (spreadExpand) Spread(buckets) else buckets)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms)), y ->
          |    struct(x.a AS id_a, y.a AS id_b, x.b AS pay_a, y.b AS pay_b))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.pay_a"), col("p.pay_b"))
      .distinct()
  }

  /** MinHash+LSH banding parameters: signature length = bands ·
    * rowsPerBand minhash permutations. A distinct type (rather than
    * bare Int positionals) so a stale call site written against an
    * older (k, b, r) signature fails to compile instead of silently
    * reinterpreting its arguments.
    */
  final case class MinHashLsh(bands: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100)

  /** Candidate near-duplicate pairs from MinHash+LSH banding:
    * docs sharing any band bucket, deduped across bands.
    */
  def minhashCandidates(docs: DataFrame, text: Column = col("text"),
      lsh: MinHashLsh = MinHashLsh()): DataFrame = {
    val keyed = docs
      .select(col("doc_id"),
        posexplode(graft.functions.TextExpressions.minhashBandBuckets(
          text, lsh.bands, lsh.rowsPerBand)).as(Seq("band", "bucket")))
    bucketPairs(keyed, lsh.maxBucket).select("id_a", "id_b")
  }

  /** Banded LSH postings of a doc set — (band, bucket, doc_id), the
    * relation [[incrementalMinhash]] persists between ingest batches.
    */
  def minhashEntries(docs: DataFrame, text: Column = col("text"),
      lsh: MinHashLsh = MinHashLsh()): DataFrame =
    docs.select(col("doc_id"),
      posexplode(graft.functions.TextExpressions.minhashBandBuckets(
        text, lsh.bands, lsh.rowsPerBand)).as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("doc_id"))

  /** Incremental near-dup ingestion (SURVEY.md §2 C32) — dedup for a
    * corpus that GROWS: each ingest batch is LSH-hashed once, probed
    * against the persisted postings index, and appended to it — the
    * full corpus is never re-hashed or re-paired. Per batch:
    * candidate pairs = (new × new) within-bucket ∪ (index × new)
    * same-bucket, both capped by the same oversized-bucket guard as
    * the one-shot path (evaluated against the corpus-so-far bucket
    * size, so a batch never expands a degenerate bucket).
    *
    * Returns (pairs, newEntries); the caller appends newEntries to
    * the index (e.g. parquet partitioned/bucketed by (band, bucket),
    * so the probe join co-partitions and touches only the new
    * buckets' postings).
    *
    * Equality contract: ingesting a corpus in ANY batch order yields
    * exactly the one-shot [[minhashCandidates]] pair set, as long as
    * no bucket crosses `maxBucket` mid-stream (spec-gated). Emission
    * is monotone — an incremental pipeline cannot retract — so a
    * bucket that exceeds the cap only as later batches arrive keeps
    * the pairs it emitted while legal, where the one-shot run drops
    * the whole bucket.
    *
    * Scale shape: the index is bands·N small rows; the per-batch cost
    * is hash(newDocs) + two bucket-local joins ∝ |batch| postings —
    * never ∝ corpus. This is the 100 TB ingest loop: the alternative
    * (re-run one-shot LSH per ingest) re-pays the whole corpus every
    * batch.
    */
  def incrementalMinhash(newDocs: DataFrame, index: DataFrame,
      text: Column = col("text"), lsh: MinHashLsh = MinHashLsh()): (DataFrame, DataFrame) = {
    val newEntries = minhashEntries(newDocs, text, lsh)
    val oversized = index.select("band", "bucket", "doc_id")
      .unionByName(newEntries)
      .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > lsh.maxBucket)
      .select("band", "bucket")
    val keptNew = newEntries.join(oversized, Seq("band", "bucket"), "left_anti")
    val keptOld = index.join(oversized, Seq("band", "bucket"), "left_anti")
    val withinNew = bucketPairs(keptNew, lsh.maxBucket).select("id_a", "id_b")
    val crossOld = keptOld
      .select(col("band"), col("bucket"), col("doc_id").as("old_id"))
      .join(keptNew.select(col("band"), col("bucket"), col("doc_id").as("new_id")),
        Seq("band", "bucket"))
      .select(least(col("old_id"), col("new_id")).as("id_a"),
        greatest(col("old_id"), col("new_id")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    (withinNew.unionByName(crossOld).distinct(), newEntries)
  }

  /** Jaccard similarity of the two docs' shingle sets — the exact
    * verification pass over LSH candidates (candidates ≪ corpus², so
    * carrying the shingle arrays through the join is cheap).
    */
  def ngramJaccardVerify(candidates: DataFrame, docs: DataFrame,
      text: Column = col("text"), minJaccard: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(text).as("sh"))
    // r14 (guide §2.3, exact — same staged verdict as the C4b truth):
    // one explicitly-ordered filter short-circuits per candidate —
    // size-ratio prune (distinct arrays ⇒ J ≤ min/max; 1e-6 slack
    // covers the round(·,6) keep-boundary), single-intersect
    // prescreen (J ≥ τ' ⟺ I ≥ τ'/(1+τ')·(|A|+|B|), conservatively
    // below the boundary), then the exact verdict on the rare
    // survivors. |A∪B| = |A|+|B|−|A∩B| for distinct arrays and the
    // division is the identical double, so round(·,6) matches the
    // pre-r14 form bit-for-bit; hash-gated.
    val sa = size(col("sh_a")).cast("double")
    val sb = size(col("sh_b")).cast("double")
    val i = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val jac = round(i / (sa + sb - i), 6)
    val prescreen = lit((minJaccard - 1e-6) / (1.0 + minJaccard) - 1e-6)
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter((least(sa, sb) >= lit(minJaccard - 1e-6) * greatest(sa, sb)) &&
        (i >= prescreen * (sa + sb)) &&
        (jac >= minJaccard))
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
  }

  /** All word n-gram positions of one corpus pass, one row per
    * position (the substrate of [[duplicatedSpans]] /
    * [[spanDupStats]], SURVEY.md §2 C38). Codegen'd
    * transform(sequence(...)) — every position is kept (no per-doc
    * dedup, unlike [[shingles]]) so downstream counts are
    * occurrence-exact; docs shorter than n yield no grams.
    */
  def spanGrams(docs: DataFrame, n: Int, text: Column = col("text")): DataFrame = {
    val g =
      s"""CASE WHEN size(_toks) < $n THEN array()
         |ELSE transform(sequence(0, size(_toks) - $n),
         |  i -> ${(0 until n).map(j => s"_toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")")})
         |END""".stripMargin
    // r14: spread before the gram explode — the corpus scans as one
    // partition (single row group) and the per-position concat ran
    // single-task (Spread).
    Spread(docs.select(col("doc_id"), split(text, " ").as("_toks")))
      .select(col("doc_id"), explode(expr(g)).as("gram"))
  }

  /** Exact duplicated-span detection (substring-level dedup — the
    * repeated-passage scan of "Deduplicating Training Data Makes
    * Language Models Better": boilerplate, licenses, templated
    * passages that document-level dedup can never see): every word
    * n-gram occurring in ≥ `minDocs` distinct documents, with its
    * document frequency and total occurrence count.
    *
    * Scale shape: explode to (doc, gram) positions, then ONE hash
    * aggregation keyed by the gram — map-side combine collapses
    * within-partition repeats before the wire, and no pair expansion
    * ever happens (the output is per-SPAN, not per-pair, so a
    * million-doc boilerplate string costs one row, not 10¹² pairs).
    * Production would aggregate on xxhash64(gram) to cut shuffle
    * width ~n·word bytes → 8; raw strings here keep the oracle exact.
    */
  def duplicatedSpans(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      text: Column = col("text")): DataFrame =
    spanGrams(docs, n, text)
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document duplicated-span coverage: of a doc's n-gram
    * positions, how many carry a gram that also appears in ≥
    * `minDocs` docs — the signal for dropping (or trimming) docs
    * dominated by cross-corpus boilerplate. Two aggregations + one
    * hash join on the gram; docs shorter than n have no positions
    * and drop out (their coverage is undefined, not 0).
    */
  def spanDupStats(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      text: Column = col("text")): DataFrame = {
    val g = spanGrams(docs, n, text)
    val dup = g.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("gram"), lit(1).as("_dup"))
    g.join(dup, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("_dup")).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 6))
  }

  /** Passage-level exact dedup with keep-first rewrite (C55) — the
    * CCNet/RefinedWeb "line dedup" pass applied to fixed-length
    * passages: docs split into consecutive `segTokens`-token segments
    * (last one may be short), any segment TEXT present in ≥ `minDocs`
    * distinct docs is corpus-duplicated, and every occurrence of a
    * duplicated segment is DROPPED except in the single lowest-id doc
    * containing it (keep-first — the corpus keeps exactly one copy of
    * each duplicated passage, unlike C38 which only reports them).
    * Docs are reassembled from their surviving segments in order.
    *
    * Output per doc: n_segs, n_dropped, tokens_clean (token count
    * after the rewrite), text_clean ('' when everything was dropped —
    * the caller decides whether an emptied doc survives).
    *
    * Scale shape: the segment explode is pure per-row map work
    * (C14c's chunk-index shape); the duplicate directory is ONE hash
    * agg keyed by segment text (map-side combine; output ∝ distinct
    * duplicated segments, per-SPAN never per-pair) joined back on the
    * text; the reassembly is the B30 ordered-concat shape — one
    * per-doc hash agg collecting (idx, seg) structs, sorted and
    * joined per group, state ∝ doc length. No windows, no corpus
    * self-join. Production would key the directory join on
    * xxhash64(segment) to cut shuffle width (the C38 note); raw
    * strings here keep the oracle exact.
    */
  def dedupSegments(docs: DataFrame, segTokens: Int = 5, minDocs: Int = 2,
      docId: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    require(minDocs >= 2,
      s"minDocs must be >= 2 (a 1 would drop every segment everywhere " +
        s"but its own doc — not a dedup), got $minDocs")
    // one greedy regex pass splits the text into consecutive
    // segTokens-token segments directly — ~5× cheaper than
    // split→transform→slice→array_join (measured on the 100k-doc
    // probe: 4.1 s vs 16.6 s for the same 11M segments, multiset-
    // identical). Precondition: canonically single-space-separated
    // tokens (what normalizeText's whitespace collapse guarantees);
    // an empty text keeps split()'s one-empty-segment behavior so a
    // doc never silently vanishes from the output.
    val segRx = s"\\S+( \\S+){0,${segTokens - 1}}"
    val segs = docs.select(docId.as("doc_id"),
        posexplode(when(length(text) === 0, array(lit("")))
          .otherwise(regexp_extract_all(text, lit(segRx), lit(0)))))
      .toDF("doc_id", "seg_idx", "seg")
    // duplicate directory: for the default minDocs = 2, "appears in
    // ≥2 distinct docs" is exactly min(doc_id) ≠ max(doc_id) — ONE
    // hash agg / one shuffle of the segment keys, where countDistinct
    // plans a two-level expand that shuffles the string keys twice
    // (measured 2.4× slower on the 100k-doc probe)
    val dup =
      if (minDocs == 2)
        segs.groupBy("seg")
          .agg(min(col("doc_id")).as("_keeper"), max(col("doc_id")).as("_max"))
          .filter(col("_max") =!= col("_keeper"))
      else
        segs.groupBy("seg")
          .agg(countDistinct(col("doc_id")).as("_nd"),
            min(col("doc_id")).as("_keeper"))
          .filter(col("_nd") >= minDocs)
    val marked = segs.join(dup.select("seg", "_keeper"), Seq("seg"), "left")
      .withColumn("_keep", col("_keeper").isNull || col("_keeper") === col("doc_id"))
    marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        count(when(!col("_keep"), lit(1))).as("n_dropped"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN _keep THEN " +
            "struct(seg_idx, seg) END)), x -> x.seg)")).as("text_clean"))
      .withColumn("tokens_clean",
        when(col("text_clean") === "", lit(0L))
          .otherwise(size(split(col("text_clean"), " ")).cast("long")))
      .select(col("doc_id"), col("n_segs"), col("n_dropped"),
        col("tokens_clean"), col("text_clean"))
  }

  /** 64-bit SimHash over the token multiset: per bit, sum ±1 weighted
    * by each token hash's bit; sign → bit. Pure fold — one pass over
    * the tokens, no shuffle.
    */
  def simhash(text: Column): Column =
    graft.functions.TextExpressions.simhash64(text)

  /** SimHash near-duplicate pairs: 4 bands of 16 bits as LSH on the
    * 64-bit fingerprint, then exact Hamming-distance verification
    * with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, text: Column = col("text"),
      maxHamming: Int = 3, maxBucket: Int = 100): DataFrame = {
    val sh = docs.select(col("doc_id"), simhash(text).as("sim"))
    val keyed = sh.select(col("doc_id"), col("sim"), posexplode(
        array((0 to 3).map(b =>
          shiftright(col("sim"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*)
      ).as(Seq("band", "bucket")))
    // The fingerprint rides through the bucket arrays as the pair
    // payload, so the Hamming verify needs no join back to the docs.
    bucketPairs(keyed, maxBucket, payload = col("sim"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("pay_a").bitwiseXOR(col("pay_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** C88: edit-distance near-duplicate verification — the
    * character-level confirmation pass (catches reorder-resistant
    * token-set false positives and char-level typo dups that token
    * shingles miss). Candidates come from deterministic blocking on
    * (source, length DIV `bucketChars`) — a length-difference bound
    * is implied by the shared bucket, so the quadratic step is
    * bucket-local, never corpus-wide (at production scale the
    * candidate feed would be C2's LSH pairs; the blocked feed here
    * is what an oracle can re-derive). `levenshtein` is Spark's
    * codegen'd DP kernel, cost O(len²) per pair — bounded by the
    * blocking, and the docs themselves bound len. Similarity is
    * integer ppm of the longer side; `is_near` applies
    * `verdictPpm`. Empty-vs-empty guards through greatest(..., 1).
    */
  /** C2∘C88 (r10, r9 verdict #4): the PRODUCTION-shape edit-distance
    * dedup — candidate pairs from the C2 MinHash band buckets (cost ∝
    * bucket contents; the corpus-wide quadratic never materializes),
    * each candidate confirmed by the same integer levenshtein
    * verdict as [[editDistancePairs]] (which keeps its blocked-feed
    * TRUTH role). The text join-back is two doc_id hash joins
    * (broadcast-eligible for bounded candidate sets); the
    * levenshtein DP runs once per CANDIDATE, so total cost is
    * O(|candidates| · len²) — at 100 TB |candidates| is governed by
    * the LSH bucket cap, never N².
    */
  def lshEditVerify(docs: DataFrame, verdictPpm: Long = 700000L,
      lsh: MinHashLsh = MinHashLsh()): DataFrame = {
    val t = docs.select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("len"))
    minhashCandidates(docs, lsh = lsh)
      .join(t.select(col("doc_id").as("id_a"), col("text").as("text_a"),
        col("len").as("len_a")), Seq("id_a"))
      .join(t.select(col("doc_id").as("id_b"), col("text").as("text_b"),
        col("len").as("len_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("dist"),
        col("len_a"), col("len_b"))
      .withColumn("sim_ppm", expr(
        "1000000L - dist * 1000000L DIV greatest(len_a, len_b, 1L)"))
      .filter(col("sim_ppm") >= verdictPpm)
  }

  def editDistancePairs(docs: DataFrame, bucketChars: Int = 32,
      verdictPpm: Long = 700000L): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("text"),
      length(col("text")).cast("long").as("len"))
      .withColumn("bucket", expr(s"len div $bucketChars"))
    // r14 (guide §2.5/§2.6 — engage every core): the doc corpus scans
    // as ONE partition (single small parquet file), the bucket side
    // broadcasts, and the levenshtein projection then runs in that one
    // task — measured 2×6.6 s single-task stages at sf0.1 (the second
    // is the orderBy's range-sample recompute). Spreading the stream
    // side over defaultParallelism (scale-adaptive, = cores locally)
    // parallelizes the O(len²) DP kernel; results are per-row exact,
    // unchanged.
    val a = base.select(col("doc_id").as("id_a"), col("source"),
      col("bucket"), col("text").as("text_a"), col("len").as("len_a"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val b = base.select(col("doc_id").as("id_b"), col("source"),
      col("bucket"), col("text").as("text_b"), col("len").as("len_b"))
    a.join(broadcast(b), Seq("source", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("source"), col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("dist"),
        col("len_a"), col("len_b"))
      .withColumn("sim_ppm", expr(
        "1000000L - dist * 1000000L DIV greatest(len_a, len_b, 1L)"))
      .withColumn("is_near", (col("sim_ppm") >= verdictPpm).cast("long"))
  }
}
