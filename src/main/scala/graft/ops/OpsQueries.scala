package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}
import graft.cdc.CdcEnvelope

/** Driver-gated queries for the LLM-data-pipeline operators
  * (SURVEY.md §2 C-series) over the documents/embeddings tables.
  * SQL-expressible ops carry a DuckDB oracle; the LSH/banding ops
  * (Spark-hash-dependent) are deterministic but rows-only.
  */
object OpsQueries {

  private val stopListSql = TextAnalysis.Stopwords.map { case (l, ws) =>
    l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
  }.toMap

  // C1: exact dedup groups.
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(T.documents(s, d)).orderBy(col("keep_id"))

  private val oDedupExact =
    """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** Exact all-pairs n-gram Jaccard ≥ `minJ` truth over a capped doc
    * universe — the shared truth side of the C2/C32 recall gates and
    * the C4b ground-truth query. The cap bounds the O(N²) compare at
    * bench SF (the universe is the FULL corpus at the driver's
    * correctness SF); the formula mirrors the DuckDB oracle
    * word-shingle arithmetic term for term, so the truth pairs
    * hash-match across engines (the C4 pattern).
    */
  private def jaccardTruth(docs: DataFrame, minJ: Double): DataFrame = {
    // r14 (guide §2.3/§8 — decide with small rows, exact): the N²
    // nested loop with per-pair array_intersect/array_union is
    // replaced by the inverted-index co-occurrence count. Shingle
    // arrays are DISTINCT per doc (WordShingles contract), so the
    // shingle-keyed self-equi-join emits exactly one row per shared
    // shingle per pair — the groupBy count IS |A∩B|, and
    // |A∪B| = |A|+|B|−|A∩B| exactly. Pairs with |A∩B| = 0 have J = 0
    // and could never pass minJ, so their absence from the
    // co-occurrence table drops nothing. The division feeds the same
    // doubles into round(·,6) as size(array_intersect)/size(
    // array_union) did (small integers are exactly representable), so
    // results match the pre-r14 form bit-for-bit — hash-gated. This
    // is also the truth gate's 100 TB shape: cost ∝ shared-shingle
    // occurrences, never N².
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val sz = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val inter = ex.select(col("doc_id").as("id_a"), col("g"))
      .join(ex.select(col("doc_id").as("id_b"), col("g")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sz.select(col("doc_id").as("id_a"), col("n").as("sa"))),
        Seq("id_a"))
      .join(broadcast(sz.select(col("doc_id").as("id_b"), col("n").as("sb"))),
        Seq("id_b"))
      .withColumn("jaccard", round(col("i").cast("double")
        / (col("sa") + col("sb") - col("i")).cast("double"), 6))
      .filter(col("jaccard") >= minJ)
      .select("id_a", "id_b", "jaccard")
  }

  /** [[jaccardTruth]], computed once per (session, sf, cap, τ) and
    * eagerly checkpointed: the C2 and C32 recall gates share the SAME
    * truth side, and a bench pass re-invokes each gate three times —
    * without the cache every pass re-pays the O(N²) scaffolding that
    * exists only to verify the (cheap) LSH result. The handful of
    * truth rows pin in memory; the gates' TIMED work (LSH hashing,
    * bucket joins, incremental postings) still runs every pass.
    */
  private val truthCache =
    scala.collection.mutable.Map.empty[(Int, String, Double), DataFrame]
  private def jaccardTruthCached(s: SparkSession, d: String, cap: Int,
      minJ: Double): DataFrame = truthCache.synchronized {
    truthCache.getOrElseUpdate((System.identityHashCode(s), s"$d|$cap", minJ),
      jaccardTruth(T.documents(s, d).filter(col("doc_id") < cap), minJ)
        .localCheckpoint(true))
  }

  /** DuckDB side of [[jaccardTruth]] (parameterized clone of the C4b
    * oracle): truth pairs with J ≥ `minJ` among doc_id < `cap`.
    */
  private def oJaccardTruth(cap: Int, minJ: Double): String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
       |         ELSE list_distinct(list_transform(
       |                range(1, len(string_split(text, ' ')) - 1),
       |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
       |    END AS sh
       |  FROM documents WHERE doc_id < $cap),
       |truth AS (
       |  SELECT id_a, id_b, jaccard FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      round(len(list_intersect(a.sh, b.sh))
       |            / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
       |  WHERE jaccard >= $minJ)""".stripMargin

  // C2 (gate upgraded r9, was rows-only): MinHash+LSH recall vs the
  // exact J≥0.5 truth. The candidate set itself is Spark-hash-seeded
  // (not oracle-portable), but its RECALL against oracle-re-derivable
  // truth is: one row per TRUE pair with a found flag the banding is
  // measured to satisfy on this corpus (found=1 for every pair —
  // the same 100%-recall fact the C4 gate proves end-to-end). A
  // banding/bucketing regression now flips found to 0 and the hash
  // mismatches; before r9 the driver could not tell candidates from
  // garbage. Universe capped at 500 docs = the full corpus at the
  // driver's correctness SF; the cap only bounds the O(N²) truth at
  // bench SF.
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).filter(col("doc_id") < 500)
    val cands = Dedup.minhashCandidates(docs)
      .select(col("id_a"), col("id_b"), lit(1).as("c"))
    jaccardTruthCached(s, d, 500, 0.5).join(cands, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        coalesce(col("c"), lit(0)).as("found"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val oDedupMinhashLsh =
    oJaccardTruth(500, 0.5) +
      "\nSELECT id_a, id_b, jaccard, 1 AS found FROM truth ORDER BY id_a, id_b"

  // C3 (gate upgraded r9, was rows-only): SimHash banding LAW export.
  // The fingerprints are Spark-hash-seeded, so the pairs themselves
  // are not oracle-portable — but the pigeonhole law is exact: 4
  // bands × 16 bits guarantee every Hamming≤3 pair shares a band, so
  // the banded+verified pair set must EQUAL the brute-force all-pairs
  // Hamming≤3 truth (OpsSpec proves this at test SF; this gate proves
  // it at the driver's SF and exports the integers). n_missed > 0 ⇒
  // banding lost a pair (bucket cap tripped or band math broke);
  // n_extra > 0 ⇒ the Hamming verify filter broke; has_pairs pins the
  // gate non-vacuous (this corpus has near-dup pairs). Universe
  // capped at 2000 docs to bound the O(N²) xor scan at bench SF.
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).filter(col("doc_id") < 2000)
    val banded = Dedup.simhashPairs(docs)
      .select(col("id_a"), col("id_b"), lit(1).as("b"))
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))
    val brute = sh.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("sim").as("sim_b")))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
      .select(col("id_a"), col("id_b"), lit(1).as("t"))
    brute.join(banded, Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(when(col("b").isNull, 1).otherwise(0)), lit(0))
          .cast("bigint").as("n_missed"),
        coalesce(sum(when(col("t").isNull, 1).otherwise(0)), lit(0))
          .cast("bigint").as("n_extra"),
        (count(lit(1)) > 0).as("has_pairs"))
  }

  private val oDedupSimhash =
    """SELECT CAST(0 AS BIGINT) AS n_missed, CAST(0 AS BIGINT) AS n_extra,
      |  TRUE AS has_pairs""".stripMargin

  // C4: exact n-gram Jaccard verification over the LSH candidates.
  // Oracle-gated since r2: the oracle is the ALL-PAIRS J≥0.5 truth, so
  // the hash compare proves the LSH candidate generation (C2) missed
  // no true pair on this corpus AND the verify math matches DuckDB —
  // a 100%-recall gate, not a row count.
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardVerify(Dedup.minhashCandidates(T.documents(s, d)), T.documents(s, d))
      .orderBy(col("id_a"), col("id_b"))

  private val oDedupNgramJaccard =
    """WITH sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
      |         ELSE list_distinct(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
      |    END AS sh
      |  FROM documents)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    round(len(list_intersect(a.sh, b.sh))
      |          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
      |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  // C38: exact duplicated-span detection — every word 8-gram
  // occurring in ≥2 distinct docs (the repeated-passage scan that
  // document-level dedup can never see), plus the per-doc coverage
  // fraction a pipeline uses to drop boilerplate-dominated docs.
  // Counts are occurrence-exact integers; dup_frac is a ratio of two
  // integers, so both engines compute the identical double.
  def textDupSpans(s: SparkSession, d: String): DataFrame =
    Dedup.duplicatedSpans(T.documents(s, d).select("doc_id", "text"))
      .orderBy(col("gram"))

  private val gram8Sql =
    (0 until 8).map(j => s"toks[i + $j]").mkString(" || ' ' || ")

  private val oTextDupSpans =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 7),
       |        i -> $gram8Sql)) AS gram FROM t)
       |SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
       |FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY gram""".stripMargin

  def textDupSpanFrac(s: SparkSession, d: String): DataFrame =
    Dedup.spanDupStats(T.documents(s, d).select("doc_id", "text"))
      .orderBy(col("doc_id"))

  private val oTextDupSpanFrac =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 7),
       |        i -> $gram8Sql)) AS gram FROM t),
       |dup AS (SELECT gram, 1 AS _dup FROM g GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2)
       |SELECT doc_id, count(*) AS n_grams, count(_dup) AS n_dup,
       |  round(count(_dup)::DOUBLE / count(*), 6) AS dup_frac
       |FROM g LEFT JOIN dup USING (gram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // C4b: exact all-pairs n-gram Jaccard (no LSH prefilter) — the
  // oracle-gated ground truth the C4 LSH+verify path approximates.
  // Jaccard is a ratio of two integers, so both engines compute the
  // identical double: the threshold needs no float margin.
  def textJaccardPairs(s: SparkSession, d: String): DataFrame =
    jaccardTruth(T.documents(s, d).filter(col("doc_id") < 500), 0.4)
      .orderBy(col("id_a"), col("id_b"))

  private val oTextJaccardPairs =
    """WITH sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
      |         ELSE list_distinct(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
      |    END AS sh
      |  FROM documents WHERE doc_id < 500)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    round(len(list_intersect(a.sh, b.sh))
      |          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
      |WHERE jaccard >= 0.4 ORDER BY id_a, id_b""".stripMargin

  // C5: embedding-cosine near-dup pairs; τ=0.42 sits in a measured
  // 1.7e-3 margin of this corpus (no pair within it), so float64
  // engine differences can't flip membership.
  def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Similarity.cosinePairs(T.embeddings(s, d), 0.42).orderBy(col("id_a"), col("id_b"))

  private val oDedupEmbedding =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                             CAST(b.embedding AS DOUBLE[])) >= 0.42
      |ORDER BY id_a, id_b""".stripMargin

  // C13: duplicate-cluster resolution — connected components over the
  // LSH+verify pair graph, canonical = min doc_id per component. The
  // oracle recomputes components from the ALL-PAIRS J≥0.5 graph with
  // a recursive CTE, so the gate covers LSH recall AND the iterative
  // label propagation.
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val pairs = Dedup.ngramJaccardVerify(Dedup.minhashCandidates(docs), docs)
      .select("id_a", "id_b")
    Clusters.canonicalAssignment(pairs).orderBy(col("doc_id"))
  }

  private val oDedupClusters =
    """WITH RECURSIVE
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
      |         ELSE list_distinct(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
      |    END AS sh
      |  FROM documents),
      |p AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |      len(list_intersect(a.sh, b.sh))
      |        / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
      |  WHERE jaccard >= 0.5),
      |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |reach AS (
      |  SELECT src AS id, src AS comp FROM e
      |  UNION
      |  SELECT e.dst AS id, r.comp FROM reach r JOIN e ON e.src = r.id)
      |SELECT id AS doc_id, min(comp) AS canonical_id,
      |  (id = min(comp)) AS is_canonical
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  // C145 = C13 ∘ weighting (r14): dedup-aware training weights — the
  // SOFT-dedup alternative to dropping near-duplicates (the C37 hard
  // gate): every doc keeps weight 10⁶ div cluster_size ppm, so a
  // 5-copy near-dup cluster contributes ~one doc's worth of training
  // mass instead of 5× (the "count every document once" recipe
  // without discarding variants — variants still contribute their
  // unique spans, repeated mass doesn't dominate the loss).
  // Singletons (docs outside the pair graph) take cluster_size 1 /
  // weight 10⁶ via the left-join fallback. Same production pair graph
  // as C13 (LSH candidates → Jaccard verify → connected components);
  // cluster sizes are one hash agg over the canonical assignment.
  def dedupClusterWeights(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val pairs = Dedup.ngramJaccardVerify(Dedup.minhashCandidates(docs), docs)
      .select("id_a", "id_b")
    val comp = Clusters.canonicalAssignment(pairs)
      .select(col("doc_id"), col("canonical_id"))
    val all = docs.select("doc_id").join(comp, Seq("doc_id"), "left")
      .withColumn("canonical_id",
        coalesce(col("canonical_id"), col("doc_id")))
    val sizes = all.groupBy("canonical_id")
      .agg(count(lit(1)).as("cluster_size"))
    all.join(sizes, "canonical_id")
      .withColumn("weight_ppm", expr("1000000L div cluster_size"))
      .select("doc_id", "canonical_id", "cluster_size", "weight_ppm")
      .orderBy("doc_id")
  }

  private val oDedupClusterWeights =
    """WITH RECURSIVE
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
      |         ELSE list_distinct(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
      |    END AS sh
      |  FROM documents),
      |p AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |      len(list_intersect(a.sh, b.sh))
      |        / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
      |  WHERE jaccard >= 0.5),
      |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |reach AS (
      |  SELECT src AS id, src AS comp FROM e
      |  UNION
      |  SELECT e.dst AS id, r.comp FROM reach r JOIN e ON e.src = r.id),
      |asg AS (SELECT d.doc_id,
      |    coalesce(min(r.comp), d.doc_id) AS canonical_id
      |  FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
      |  GROUP BY d.doc_id),
      |sz AS (SELECT canonical_id,
      |    CAST(count(*) AS BIGINT) AS cluster_size
      |  FROM asg GROUP BY canonical_id)
      |SELECT a.doc_id, a.canonical_id, s.cluster_size,
      |  CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
      |FROM asg a JOIN sz s USING (canonical_id)
      |ORDER BY a.doc_id""".stripMargin

  // C46: leakage-safe split — near-dup clusters assigned to ONE side.
  // The oracle re-derives EVERYTHING: the exact all-pairs Jaccard
  // graph, the recursive-CTE components, the representative fallback,
  // and the mod-prime bucket arithmetic — one hash compare pins the
  // whole composition.
  def splitLeakageSafeQ(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val pairs = Dedup.ngramJaccardVerify(Dedup.minhashCandidates(docs), docs)
      .select("id_a", "id_b")
    Packing.splitLeakageSafe(docs, pairs)
      .select(col("doc_id"), col("rep_id"), col("split_bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  private val oSplitLeakageSafe =
    """WITH RECURSIVE
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
      |         ELSE list_distinct(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
      |    END AS sh
      |  FROM documents),
      |p AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |      len(list_intersect(a.sh, b.sh))
      |        / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
      |  WHERE jaccard >= 0.5),
      |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |reach AS (
      |  SELECT src AS id, src AS comp FROM e
      |  UNION
      |  SELECT e.dst AS id, r.comp FROM reach r JOIN e ON e.src = r.id),
      |canon AS (SELECT id AS doc_id, min(comp) AS canonical_id FROM reach GROUP BY id),
      |rep AS (
      |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS rep_id
      |  FROM documents d LEFT JOIN canon c ON d.doc_id = c.doc_id)
      |SELECT doc_id, rep_id, b AS split_bucket,
      |  CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id, rep_id,
      |        ((rep_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
      |      FROM rep) t
      |ORDER BY doc_id""".stripMargin

  // C5 scale path (primary): LSH buckets → exact cosine verify. Same
  // oracle as dedup_embedding — the hash compare proves the bucketed
  // path reproduces the exact all-pairs result. Since r11 the gate
  // runs the AUTO-scaled parameters (occupancy-pinned planes,
  // recall-driven tables, Similarity.lshAutoParams): the sf1.0 probe
  // caught fixed (24, 4) going quadratic (candidates ∝ N²/2⁴ at any
  // N; 4.6 s → 393 s for ×10 data). At gate SFs auto resolves to the
  // planes=4 regime the τ=0.42 oracle was tuned on, with tables ≥ the
  // old 24 — recall can only improve, so the exact-pairs hash gate
  // still pins it.
  def dedupEmbeddingLsh(s: SparkSession, d: String): DataFrame =
    Similarity.cosinePairsLshAuto(T.embeddings(s, d), 0.42)
      .orderBy(col("id_a"), col("id_b"))

  // C40: semantic decontamination — benchmark = every 10th vector,
  // corpus = the rest; kept corpus rows hash-matched against the
  // exact NOT EXISTS oracle, so the compare covers cross-set LSH
  // recall AND the anti-join in one gate.
  def decontaminateSemantic(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    Similarity.semanticDecontaminateAuto(
      emb.filter(col("vec_id") % 10 =!= 0),
      emb.filter(col("vec_id") % 10 === 0), 0.42)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  private val oDecontaminateSemantic =
    """SELECT c.vec_id, c.label FROM embeddings c
      |WHERE c.vec_id % 10 != 0 AND NOT EXISTS (
      |  SELECT 1 FROM embeddings b WHERE b.vec_id % 10 = 0
      |    AND list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])) >= 0.42)
      |ORDER BY c.vec_id""".stripMargin

  // C37: end-to-end semantic dedup (the SemDeDup shape): LSH-bucketed
  // cosine pairs → connected components → keep ONE canonical vector
  // (min id) per near-duplicate cluster, everything else anti-joined
  // away. Composes the C5b scale path with C13's cluster resolution;
  // the oracle recomputes the kept set from the EXACT all-pairs graph
  // with a recursive CTE, so the gate covers LSH recall, component
  // resolution, AND the final filter in one hash compare.
  def dedupSemanticKeep(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    val pairs = Similarity.cosinePairsLshAuto(emb, 0.42).select("id_a", "id_b")
    val losers = Clusters.canonicalAssignment(pairs)
      .filter(!col("is_canonical")).select(col("doc_id").as("vec_id"))
    emb.select(col("vec_id"), col("label"))
      .join(losers, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  private val oDedupSemanticKeep =
    """WITH RECURSIVE
      |p AS MATERIALIZED (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])) >= 0.42),
      |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |reach AS (
      |  SELECT src AS id, src AS comp FROM e
      |  UNION
      |  SELECT e.dst AS id, r.comp FROM reach r JOIN e ON e.src = r.id),
      |losers AS (SELECT id FROM reach GROUP BY id HAVING id != min(comp))
      |SELECT vec_id, label FROM embeddings
      |WHERE vec_id NOT IN (SELECT id FROM losers)
      |ORDER BY vec_id""".stripMargin

  // C6: brute-force cosine top-k (query set = vec_id < 10).
  def annCosineTopk(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    Similarity.cosineTopK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), 5)
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  private val oAnnCosineTopk =
    """SELECT query_id, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])) DESC,
      |               c.vec_id) AS rnk
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10) t
      |WHERE rnk <= 5 ORDER BY query_id, neighbor_id""".stripMargin

  // C6b (r10): FILTERED vector search — the modern retrieval shape
  // (top-k among candidates passing a metadata predicate: same
  // category, right language, allowed license). The load-bearing plan
  // fact: the filter is not a post-pass over an unfiltered top-k
  // (which silently under-fills k) and not a residual predicate on a
  // cross join — the metadata column becomes the JOIN KEY, so
  // distance work is label-partition-local (cost ∝ matching
  // candidates, the same pruning an IVF list gives spatially). Exact
  // within the filter by construction; same codegen'd cosine and
  // (sim DESC, id) tie-break as C6.
  def annFiltered(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label"),
        col("embedding").as("qe"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("label"),
        col("embedding").as("ce"))
    val wk = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    q.join(c, "label")
      .withColumn("sim", Similarity.cosine(col("qe"), col("ce")))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("label"), col("neighbor_id"))
      .orderBy("query_id", "neighbor_id")
  }

  private val oAnnFiltered =
    """SELECT query_id, label, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])) DESC,
      |               c.vec_id) AS rnk
      |  FROM embeddings q JOIN embeddings c
      |    ON q.vec_id < 10 AND c.vec_id >= 10 AND q.label = c.label) t
      |WHERE rnk <= 5 ORDER BY query_id, neighbor_id""".stripMargin

  // C16: IVF ANN — centroids = deterministic FIXED-SIZE corpus sample
  // (the 32 lowest corpus ids), 4 probes. Fixed M is the scale
  // contract: the quantizer's centroid table must stay broadcastable
  // no matter how big the corpus grows (the r2 gate's `vec_id % 20`
  // set grew with N, breaking the broadcast claim at 100×). The
  // oracle re-expresses the SAME IVF semantics in SQL, so the gate
  // checks the inverted-list machinery exactly at any nprobe (recall
  // vs brute force is the separate honest measure, reported in
  // OpsSpec).
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    Similarity.annIvfTopK(
        e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
        e.filter(col("vec_id") >= 10 && col("vec_id") < 42), 5, 4)
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  private val oAnnIvf =
    """WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
      |              WHERE vec_id >= 10 AND vec_id < 42),
      |corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
      |qry AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |assign AS (
      |  SELECT neighbor_id, cid FROM (
      |    SELECT c.vec_id AS neighbor_id, ct.cid,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                        CAST(ct.embedding AS DOUBLE[])) DESC,
      |                 ct.cid) AS r
      |    FROM corp c CROSS JOIN cent ct) t WHERE r = 1),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.vec_id AS query_id, ct.cid,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        CAST(ct.embedding AS DOUBLE[])) DESC,
      |                 ct.cid) AS r
      |    FROM qry q CROSS JOIN cent ct) t WHERE r <= 4),
      |scored AS (
      |  SELECT p.query_id, a.neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                           CAST(c.embedding AS DOUBLE[])) AS cos
      |  FROM probes p JOIN assign a ON p.cid = a.cid
      |  JOIN qry q ON q.vec_id = p.query_id
      |  JOIN corp c ON c.vec_id = a.neighbor_id)
      |SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rnk
      |  FROM scored) t
      |WHERE rnk <= 5 ORDER BY query_id, neighbor_id""".stripMargin

  // C7 (gate upgraded r9, was rows-only): LSH-bucketed ANN,
  // self-retrieval invariant. Buckets are Spark-hash-seeded, so the
  // retrieved sets are not oracle-portable — but with the query
  // vectors INCLUDED in the corpus, exact guarantees emerge the
  // oracle can predict: an identical vector lands in identical sign
  // buckets in every table (a candidate by construction, no
  // probability involved), exact-cosine scoring must rank it first
  // (no other pair on this corpus reaches cosine 0.99), and the
  // bucket fan-out must yield a full top-5. So per query the gate
  // exports self_top1 (bucketing + scoring + ranking end-to-end) and
  // n_results (candidate generation breadth) — both deterministic.
  // The honest recall-vs-brute-force measure stays in OpsSpec.
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    Similarity.annLshTopK(e.filter(col("vec_id") < 10), e, 5)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_results"),
        max(when(col("rnk") === 1 && col("neighbor_id") === col("query_id"), 1)
          .otherwise(0)).as("self_top1"))
      .orderBy(col("query_id"))
  }

  private val oAnnLsh =
    """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results, 1 AS self_top1
      |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin

  /** Recall summary of an ANN result against the exact brute-force
    * top-k truth — the shared export of the C26/C30 gates. One row:
    * n_truth and n_retrieved the oracle RE-DERIVES from the parquet
    * (truth cardinality via the same exact top-k SQL that gates C6;
    * retrieved = |queries|·k), plus a recall-floor boolean pinned
    * under the corpus-measured recall. The exact per-pair sets are
    * codebook-seeded and not oracle-portable; the floor turns a
    * recall regression into a hash mismatch instead of an invisible
    * quality drop.
    */
  private def annRecallSummary(retrieved: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int, floorPct: Int): DataFrame = {
    val truth = Similarity.cosineTopK(queries, corpus, k)
    truth
      .join(retrieved.select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
          .distinct(),
        Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(col("hit")), lit(0)).cast("bigint").as("n_hits"))
      .select(col("n_truth"),
        (col("n_hits") * 100 >= col("n_truth") * floorPct)
          .as(s"recall_ge_$floorPct"))
  }

  /** Oracle for [[annRecallSummary]]: DuckDB re-derives n_truth via
    * the exact top-k CTE (the C6 oracle's shape) and predicts the
    * floor holds.
    */
  private def oAnnRecallSummary(floorPct: Int): String =
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                        CAST(c.embedding AS DOUBLE[])) DESC,
       |                 c.vec_id) AS rnk
       |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10) t
       |  WHERE rnk <= 5)
       |SELECT count(*) AS n_truth, TRUE AS recall_ge_$floorPct FROM truth""".stripMargin

  // C26 (r4; gate upgraded r9, was rows-only): PQ ANN, two-stage
  // (ADC shortlist → exact rerank). Codebooks are float-seeded
  // k-means, not SQL-expressible — the gate exports the recall
  // summary vs the oracle-re-derived exact truth instead (floor 60%,
  // measured 0.92 at refine=4 on this corpus; the margin absorbs
  // corpus-draw variance across SFs). Full per-query recall
  // measurement stays in OpsSpec.
  def annPq(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val model = Pq.fitDf(c.orderBy(col("vec_id")), m = 16, k = 64, iters = 10)
    val pq = Pq.adcTopKRerank(q, Pq.encode(c, model), c, model, 5)
    annRecallSummary(pq, q, c, 5, 60)
  }

  private val oAnnPq = oAnnRecallSummary(60)

  // C16∘C26 (r5; gate upgraded r9, was rows-only): IVF×PQ —
  // probe-limited ADC over inverted lists of PQ codes + exact
  // rerank. A probe budget of 4/32 lists CAPS recall well below the
  // whole-corpus C26 floor (plain IVF reaches only 14/50 on this
  // corpus — the lists the truth lives in simply aren't all probed),
  // so a fixed floor would gate the corpus, not the code. The exact
  // law is the spec's: at the same probe budget, ADC-shortlist +
  // exact rerank must not lose recall vs plain IVF's full-list exact
  // search. BOTH sides of that inequality are exportable — plain
  // IVF is deterministic SQL (the C16 oracle re-derives ivf_hits
  // exactly, quantizer and probes included), and pq_ge_ivf pins the
  // law at the driver's SF. n_truth comes from the same brute-force
  // truth CTE that gates C6.
  def annIvfPq(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val cent = e.filter(col("vec_id") >= 10 && col("vec_id") < 42)
    val model = Pq.fitDf(c.orderBy(col("vec_id")), m = 16, k = 64, iters = 10)
    val ivfPq = Pq.ivfPqTopK(q, Pq.ivfPqIndex(c, cent, model), c, cent, model,
      topK = 5, nprobe = 4)
    val truth = Similarity.cosineTopK(q, c, 5)
    val ivf = Similarity.annIvfTopK(q, c, cent, 5, 4)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("iv"))
    truth
      .join(ivfPq.select(col("query_id"), col("neighbor_id"), lit(1).as("pq"))
          .distinct(),
        Seq("query_id", "neighbor_id"), "left")
      .join(ivf, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(col("iv")), lit(0)).cast("bigint").as("ivf_hits"),
        (coalesce(sum(col("pq")), lit(0)) >= coalesce(sum(col("iv")), lit(0)))
          .as("pq_ge_ivf"))
  }

  private val oAnnIvfPq =
    """WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
      |              WHERE vec_id >= 10 AND vec_id < 42),
      |corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
      |qry AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |assign AS (
      |  SELECT neighbor_id, cid FROM (
      |    SELECT c.vec_id AS neighbor_id, ct.cid,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                        CAST(ct.embedding AS DOUBLE[])) DESC,
      |                 ct.cid) AS r
      |    FROM corp c CROSS JOIN cent ct) t WHERE r = 1),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.vec_id AS query_id, ct.cid,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        CAST(ct.embedding AS DOUBLE[])) DESC,
      |                 ct.cid) AS r
      |    FROM qry q CROSS JOIN cent ct) t WHERE r <= 4),
      |ivf AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT p.query_id, a.neighbor_id,
      |      row_number() OVER (PARTITION BY p.query_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        CAST(c.embedding AS DOUBLE[])) DESC,
      |                 a.neighbor_id) AS rnk
      |    FROM probes p JOIN assign a ON p.cid = a.cid
      |    JOIN qry q ON q.vec_id = p.query_id
      |    JOIN corp c ON c.vec_id = a.neighbor_id) t WHERE rnk <= 5),
      |truth AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        CAST(c.embedding AS DOUBLE[])) DESC,
      |                 c.vec_id) AS rnk
      |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10) t
      |  WHERE rnk <= 5)
      |SELECT (SELECT count(*) FROM truth) AS n_truth,
      |  (SELECT count(*) FROM ivf JOIN truth USING (query_id, neighbor_id))
      |    AS ivf_hits,
      |  TRUE AS pq_ge_ivf""".stripMargin

  // C8: language ID.
  def textLangid(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Per-doc langid SELECT (no ORDER BY) — reused by text_langid and
    * as a CTE body in corpus_stats. */
  private val oTextLangidBody = {
    val scores = TextAnalysis.Stopwords.map { case (l, _) =>
      s"len(list_filter(string_split(lower(text), ' '), t -> list_contains(${stopListSql(l)}, t))) AS s_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.Stopwords.map(_._1)
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val pick = langs.init.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH s AS (SELECT doc_id,
       |  $scores
       |FROM documents)
       |SELECT doc_id, CASE WHEN m = 0 THEN 'und' $pick ELSE '${langs.last}' END AS lang_pred
       |FROM (SELECT doc_id, s_${langs.mkString(", s_")}, $m AS m FROM s) t""".stripMargin
  }

  private val oTextLangid = oTextLangidBody + "\nORDER BY doc_id"

  // C84: language-ID confusion matrix — the EVAL surface over C8's
  // predictor: the labeled corpus (`lang`) vs the prediction, one
  // cell per (true, pred) pair with per-true-language recall ppm.
  // Classifier ops without an eval readout can't be tuned; this is
  // the readout, and at sf0.01 the matrix has real off-diagonal mass
  // (stopword-based ID confuses short docs), so the hash pins
  // misclassifications, not a trivial diagonal.
  def evalLangidConfusion(s: SparkSession, d: String): DataFrame = {
    val cells = T.documents(s, d)
      .select(col("lang").as("lang_true"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .groupBy("lang_true", "lang_pred").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("lang_true").agg(sum("n").as("n_true"))
    cells.join(broadcast(totals), "lang_true")
      .select(col("lang_true"), col("lang_pred"), col("n"), col("n_true"),
        expr("n * 1000000L DIV n_true").as("recall_ppm"))
      .orderBy("lang_true", "lang_pred")
  }

  private val oEvalLangidConfusion = {
    val scores = TextAnalysis.Stopwords.map { case (l, _) =>
      s"len(list_filter(string_split(lower(text), ' '), t -> list_contains(${stopListSql(l)}, t))) AS s_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.Stopwords.map(_._1)
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val pick = langs.init.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH s AS (SELECT lang AS lang_true,
       |  $scores
       |FROM documents),
       |p AS (SELECT lang_true,
       |  CASE WHEN m = 0 THEN 'und' $pick ELSE '${langs.last}' END AS lang_pred
       |  FROM (SELECT lang_true, s_${langs.mkString(", s_")}, $m AS m FROM s) t),
       |c AS (SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
       |      FROM p GROUP BY 1, 2),
       |tot AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS n_true
       |        FROM c GROUP BY 1)
       |SELECT c.lang_true, c.lang_pred, c.n, tot.n_true,
       |  c.n * 1000000 // tot.n_true AS recall_ppm
       |FROM c JOIN tot USING (lang_true)
       |ORDER BY lang_true, lang_pred""".stripMargin
  }

  // C87: sample-coverage diversity eval — the embedding-space readout
  // for a selection strategy (C20/C35/C63 pick subsets; this measures
  // how well a subset COVERS the space it was drawn from): every
  // non-sample vector's best cosine to ANY sample vector, bucketed
  // into deciles — a coreset that covers well has the mass in high
  // deciles, a redundant one leaves a long low tail. Sample = the
  // deterministic large-multiplier ppm bucket (engine-portable);
  // scoring = the C6 brute-force shape (broadcast the SMALL sample,
  // stream the corpus — work ∝ N·|sample|, never N²); bucket
  // arithmetic rides the bit-identical cosine both engines already
  // prove on the ANN gates (exact top-k ordering over thousands of
  // near ties).
  def evalSampleDiversity(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val sample = e.filter(expr("(vec_id * 554862419L) % 1000000 < 16000"))
      .select(col("vec_id").as("sid"), col("embedding").as("semb"))
    val rest = e.filter(expr("(vec_id * 554862419L) % 1000000 >= 16000"))
    rest.crossJoin(broadcast(sample))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("semb")).as("cos"))
      .groupBy("vec_id").agg(max("cos").as("best"))
      .select(expr("CAST(floor(best * 10) AS INT)").as("decile"),
        expr("CAST(floor(best * 1000000) AS BIGINT)").as("ppm"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), min("ppm").as("min_ppm"),
        max("ppm").as("max_ppm"))
      .orderBy("decile")
  }

  private val oEvalSampleDiversity =
    """WITH s AS (
      |  SELECT vec_id AS sid, embedding FROM embeddings
      |  WHERE (vec_id * 554862419) % 1000000 < 16000),
      |r AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  WHERE (vec_id * 554862419) % 1000000 >= 16000),
      |b AS (
      |  SELECT r.vec_id,
      |    max(list_cosine_similarity(CAST(r.embedding AS DOUBLE[]),
      |                               CAST(s.embedding AS DOUBLE[]))) AS best
      |  FROM r, s GROUP BY r.vec_id)
      |SELECT CAST(floor(best * 10) AS INT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(floor(best * 1000000)) AS BIGINT) AS min_ppm,
      |  CAST(max(floor(best * 1000000)) AS BIGINT) AS max_ppm
      |FROM b GROUP BY 1 ORDER BY decile""".stripMargin

  // C104 (r10): BLEU-style pairwise n-gram overlap — the standard
  // surface-similarity readout between a CANDIDATE and a REFERENCE
  // text (model-output eval, paraphrase mining, near-dup triage
  // between dedup's verdicts). Pairing is deterministic: candidate
  // doc_id vs doc_id+1 (the adjacent doc — a fixture stand-in for
  // the real candidate/reference key), reported by the candidate's
  // source. Per pair: CLIPPED
  // unigram/bigram precision (BLEU's modified precision — each
  // candidate n-gram credits at most its reference multiplicity:
  // matched = Σ_t min(cnt_cand(t), cnt_ref(t))) and the length ratio
  // BLEU's brevity penalty reads, all integer ppm — no float, no
  // geometric mean (exp/log would break cross-engine hashing; the
  // per-order precisions are the lossless export). Shape (r11 refit —
  // the r10 plan derived grams from PAIR rows, so the documents
  // self-join and tokenize re-executed ~5x/~10x inside one physical
  // plan): count grams PER DOC in ONE tokenize+explode pass (gid =
  // doc_id for unigrams, doc_id + 1M for bigrams), then equi-join the
  // count table against ITSELF shifted by one doc (candidate gid =
  // reference gid - 1) — the agg's exchange is canonically identical
  // on both join sides and under the per-doc length rollup, so Spark
  // ReuseExchange computes the explode subtree ONCE. Pair lengths come
  // from the same count table (sum of unigram counts), so the only
  // other documents scan is the text-pruned (doc_id, source) one.
  // Work ∝ total tokens, join cost ∝ distinct (doc, gram); at 100 TB
  // this is one tokenize, one shuffle keyed (doc, gram), and
  // count-table joins — the same plan at any corpus size.
  def evalNgramOverlap(s: SparkSession, d: String): DataFrame = {
    // r15 NEGATIVE RESULT, left as-was: the gram-count relation feeds
    // five subtree copies, each a single-task explode+aggregate over
    // the one-row-group scan — but AQE overlaps those five jobs across
    // cores (JobProbe: job-sum 4.6 s vs 2.2 s wall), and BOTH remedies
    // measured slower than leaving it alone (checkpoint the shared
    // tables: 1.55 → 1.84 s — the eager barriers serialize the overlap;
    // spread the scan: 1.55 → 1.86 s — the exchange outweighs the
    // per-copy parallelism). Duplication hidden by concurrency is not
    // worth removing at this size.
    val perDoc = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "concat(" +
          "transform(toks, t -> named_struct('off', CAST(0 AS BIGINT), 't', t)), " +
          "CASE WHEN size(toks) < 2 " +
          "THEN CAST(array() AS ARRAY<STRUCT<off: BIGINT, t: STRING>>) " +
          "ELSE transform(sequence(0, size(toks) - 2), " +
          "i -> named_struct('off', CAST(1000000 AS BIGINT), " +
          "'t', concat(toks[i], ' ', toks[i + 1]))) END)")).as("g"))
      .select((col("doc_id") + col("g.off")).as("gid"), col("g.t").as("tok"))
      .groupBy("gid", "tok").agg(count(lit(1)).as("c"))
    val matched = perDoc
      .join(perDoc.select((col("gid") - 1L).as("gid"), col("tok"),
        col("c").as("r")), Seq("gid", "tok"))
      .groupBy("gid").agg(sum(least(col("c"), col("r"))).as("m"))
    // Per-doc token counts from the SAME aggregated table (bigram count
    // is derivable: greatest(len - 1, 0)); split() never returns an
    // empty array, so a doc exists ⇔ it has a unigram-length row.
    val lens = perDoc.filter(col("gid") < 1000000L)
      .groupBy("gid").agg(sum(col("c")).as("len"))
    val base = T.documents(s, d).select(col("doc_id"), col("source"))
      .join(lens.select(col("gid").as("doc_id"), col("len").as("n1c")), Seq("doc_id"))
      .join(lens.select((col("gid") - 1L).as("doc_id"), col("len").as("n1r")),
        Seq("doc_id"))
      .select(col("doc_id").as("pid"), col("source"), col("n1c"), col("n1r"),
        greatest(col("n1c") - 1L, lit(0L)).as("n2c"))
    base
      .join(matched.select(col("gid").as("pid"), col("m").as("m1")),
        Seq("pid"), "left")
      .join(matched.select((col("gid") - 1000000L).as("pid"),
        col("m").as("m2")), Seq("pid"), "left")
      .na.fill(0L, Seq("m1", "m2"))
      .select(col("source"),
        expr("m1 * 1000000L div n1c").as("p1_ppm"),
        expr("m2 * 1000000L div greatest(n2c, 1L)").as("p2_ppm"),
        expr("n1c * 1000000L div greatest(n1r, 1L)").as("lr_ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(p1_ppm) div count(1)").as("mean_p1_ppm"),
        expr("sum(p2_ppm) div count(1)").as("mean_p2_ppm"),
        min(col("p1_ppm")).as("min_p1_ppm"),
        max(col("p1_ppm")).as("max_p1_ppm"),
        expr("sum(lr_ppm) div count(1)").as("mean_lr_ppm"))
      .orderBy("source")
  }

  private val oEvalNgramOverlap =
    """WITH d AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      |pairs AS MATERIALIZED (
      |  SELECT a.doc_id AS pid, a.source, a.toks AS ct, b.toks AS rt
      |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
      |grams AS MATERIALIZED (
      |  SELECT pid, ct AS cg, rt AS rg FROM pairs
      |  UNION ALL
      |  SELECT pid + 1000000,
      |    list_transform(range(1, len(ct)), i -> ct[i] || ' ' || ct[i + 1]),
      |    list_transform(range(1, len(rt)), i -> rt[i] || ' ' || rt[i + 1])
      |  FROM pairs),
      |cu AS (
      |  SELECT pid, tok, count(*) AS c
      |  FROM (SELECT pid, unnest(cg) AS tok FROM grams) GROUP BY pid, tok),
      |ru AS (
      |  SELECT pid, tok, count(*) AS r
      |  FROM (SELECT pid, unnest(rg) AS tok FROM grams) GROUP BY pid, tok),
      |m AS MATERIALIZED (
      |  SELECT pid, sum(least(c, r)) AS m
      |  FROM cu JOIN ru USING (pid, tok) GROUP BY pid),
      |per AS (
      |  SELECT p.source,
      |    coalesce(m1.m, 0) * 1000000 // len(p.ct) AS p1_ppm,
      |    coalesce(m2.m, 0) * 1000000
      |      // greatest(len(p.ct) - 1, 1) AS p2_ppm,
      |    len(p.ct) * 1000000 // greatest(len(p.rt), 1) AS lr_ppm
      |  FROM pairs p
      |  LEFT JOIN m m1 ON m1.pid = p.pid
      |  LEFT JOIN m m2 ON m2.pid = p.pid + 1000000)
      |SELECT source, count(*) AS n_pairs,
      |  CAST(sum(p1_ppm) // count(*) AS BIGINT) AS mean_p1_ppm,
      |  CAST(sum(p2_ppm) // count(*) AS BIGINT) AS mean_p2_ppm,
      |  CAST(min(p1_ppm) AS BIGINT) AS min_p1_ppm,
      |  CAST(max(p1_ppm) AS BIGINT) AS max_p1_ppm,
      |  CAST(sum(lr_ppm) // count(*) AS BIGINT) AS mean_lr_ppm
      |FROM per GROUP BY source ORDER BY source""".stripMargin

  // C105 (r10): n-gram CONTAINMENT screen — the asymmetric overlap
  // Jaccard misses: a short doc fully quoted inside a long one scores
  // tiny Jaccard (union is huge) but containment |A∩B|/|A| ≈ 1. This
  // is how pipelines catch boilerplate inclusion, quote extraction,
  // and doc-in-doc wrapping that symmetric near-dup screens pass.
  // Directed by construction (C(A→B) ≠ C(B→A)); integer ppm against
  // the same word-shingle sets as the C4 Jaccard family. This gate is
  // the capped all-pairs TRUTH (the C4b pattern — the full corpus at
  // the driver's SF); the production path feeds C2's LSH candidates
  // into the same verify, exactly as dedup_lsh_edit_verify does for
  // edit distance.
  def dedupContainment(s: SparkSession, d: String): DataFrame = {
    // r14 (guide §2.3/§8 — decide with small rows, exact): the N²
    // nested loop with one hash-set intersection per ordered pair is
    // replaced by the inverted-index co-occurrence count. Shingle
    // arrays are DISTINCT per doc (WordShingles contract), so the
    // shingle-keyed self-equi-join emits exactly one row per shared
    // shingle per ordered pair — the groupBy count IS |A∩B|, no
    // per-pair set op ever runs. Pairs with |A∩B| = 0 never pass the
    // 500000-ppm verdict, so their absence from the co-occurrence
    // table drops nothing. Sizes ride in a doc-count-sized broadcast;
    // the ppm arithmetic is the identical truncating-div integer
    // form. Results = the pre-r14 nested-loop form, hash-gated. At
    // 100 TB this is also the scale shape: cost ∝ shared-shingle
    // occurrences, never N² (hot shingles are bounded by the same
    // degenerate-bucket reality the LSH path guards; the production
    // feed is C2's LSH candidates either way).
    val sh = T.documents(s, d).filter(col("doc_id") < 500)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val sz = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val inter = ex.select(col("doc_id").as("id_a"), col("g"))
      .join(ex.select(col("doc_id").as("id_b"), col("g")), Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sz.select(col("doc_id").as("id_a"), col("n").as("n_sh_a"))),
        Seq("id_a"))
      .join(broadcast(sz.select(col("doc_id").as("id_b"), col("n").as("n_sh_b"))),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("i * 1000000L div n_sh_a").as("containment_ppm"),
        col("n_sh_a"), col("n_sh_b"))
      .filter(col("containment_ppm") >= 500000L)
      .orderBy("id_a", "id_b")
  }

  private val oDedupContainment =
    """WITH sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) <= 3 THEN [text]
      |         ELSE list_distinct(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
      |    END AS sh
      |  FROM documents WHERE doc_id < 500)
      |SELECT id_a, id_b, containment_ppm, n_sh_a, n_sh_b FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000000
      |      // len(a.sh) AS containment_ppm,
      |    CAST(len(a.sh) AS BIGINT) AS n_sh_a,
      |    CAST(len(b.sh) AS BIGINT) AS n_sh_b
      |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id) t
      |WHERE containment_ppm >= 500000
      |ORDER BY id_a, id_b""".stripMargin

  // C106 (r10): classifier calibration readout — the reliability
  // table every learned quality filter ships with: bucket the C53
  // linear classifier's integer logit into fixed-width bins and read
  // the C77 Gopher rule verdict's agreement rate per bin; a
  // well-calibrated score shows kept_ppm rising monotonically with
  // the bin. All integers; the bin key is SHIFTED non-negative before
  // the integer divide because Spark's `div` truncates toward zero
  // while DuckDB's `//` floors — they agree only for non-negative
  // operands (the B89 discipline). Two metadata-light scans + one
  // doc_id equi-join + one hash agg; report size ∝ bins, never docs.
  def evalCalibration(s: SparkSession, d: String): DataFrame = {
    val q = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("logit_micro",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .select(col("doc_id"), col("logit_micro"))
    val g = TextAnalysis.gopherRules(T.documents(s, d))
      .select(col("doc_id"), col("kept"))
    q.join(g, "doc_id")
      .withColumn("bin", expr("(logit_micro + 4000000L) div 25000L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        min(col("logit_micro")).as("min_logit"),
        max(col("logit_micro")).as("max_logit"))
      .withColumn("kept_ppm", expr("n_kept * 1000000L div n"))
      .select("bin", "n", "n_kept", "kept_ppm", "min_logit", "max_logit")
      .orderBy("bin")
  }

  private val oEvalCalibration =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    -140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3 AS logit_micro
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |        * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |      CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |        * 1000000 // length(text) AS punct_ppm,
       |      CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |    FROM documents) t),
       |g AS (
       |  SELECT doc_id,
       |    ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
       |     AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
       |     AND (nstop >= 1)) AS kept
       |  FROM (
       |    SELECT doc_id,
       |      len(string_split(text, ' ')) AS n,
       |      length(replace(text, ' ', '')) AS wlen,
       |      length(text) - length(replace(text, '#', '')) AS nhash,
       |      (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
       |      len(list_filter(string_split(text, ' '),
       |          w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
       |      len(list_intersect(string_split(lower(text), ' '),
       |          ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS nstop
       |    FROM documents) m)
       |SELECT (logit_micro + 4000000) // 25000 AS bin,
       |  count(*) AS n,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000 // count(*)
       |    AS BIGINT) AS kept_ppm,
       |  min(logit_micro) AS min_logit,
       |  max(logit_micro) AS max_logit
       |FROM q JOIN g USING (doc_id)
       |GROUP BY 1 ORDER BY bin""".stripMargin

  // C112 (r10): classifier precision/recall — C106's calibration
  // table answers "is the score monotone"; this is the other report a
  // filter review needs: the 2×2 confusion of the C53 keep decision
  // against the C77 rule verdict, with precision/recall/F1 in integer
  // ppm (F1 = 2PR/(P+R) computed on the ppm integers — one rounding,
  // same place, both engines). One doc_id equi-join + one 1-row agg;
  // the report is four counters at any corpus size.
  def evalClassifierPr(s: SparkSession, d: String): DataFrame = {
    val q = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("pred",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L) > 0L)
      .select(col("doc_id"), col("pred"))
    val g = TextAnalysis.gopherRules(T.documents(s, d))
      .select(col("doc_id"), col("kept").as("actual"))
    q.join(g, "doc_id")
      .agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("actual"), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_ppm",
        expr("tp * 1000000L div greatest(tp + fp, 1L)"))
      .withColumn("recall_ppm",
        expr("tp * 1000000L div greatest(tp + fn, 1L)"))
      .withColumn("f1_ppm",
        expr("2L * precision_ppm * recall_ppm " +
          "div greatest(precision_ppm + recall_ppm, 1L)"))
  }

  private val oEvalClassifierPr =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (-140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3) > 0 AS pred
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |        * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |      CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |        * 1000000 // length(text) AS punct_ppm,
       |      CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |    FROM documents) t),
       |g AS (
       |  SELECT doc_id,
       |    ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
       |     AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
       |     AND (nstop >= 1)) AS actual
       |  FROM (
       |    SELECT doc_id,
       |      len(string_split(text, ' ')) AS n,
       |      length(replace(text, ' ', '')) AS wlen,
       |      length(text) - length(replace(text, '#', '')) AS nhash,
       |      (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
       |      len(list_filter(string_split(text, ' '),
       |          w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
       |      len(list_intersect(string_split(lower(text), ' '),
       |          ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS nstop
       |    FROM documents) m),
       |c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM q JOIN g USING (doc_id)),
       |pr AS (
       |  SELECT *, tp * 1000000 // greatest(tp + fp, 1) AS precision_ppm,
       |    tp * 1000000 // greatest(tp + fn, 1) AS recall_ppm
       |  FROM c)
       |SELECT tp, fp, fn, tn, precision_ppm, recall_ppm,
       |  2 * precision_ppm * recall_ppm
       |    // greatest(precision_ppm + recall_ppm, 1) AS f1_ppm
       |FROM pr""".stripMargin

  // C114 (r10): binned ROC-AUC — the threshold-free ranking metric
  // for the C53 score against the C77 verdict, in the shape that
  // HOLDS AT SCALE: exact AUC needs a global rank over every score
  // (a corpus-wide sort), so production stacks bin first — the C106
  // fixed-width bins reduce the corpus to a ~bins-row histogram, and
  // the trapezoid over the descending-score cumulative (FP, TP)
  // curve IS binned AUC (within-bin ties take the average, the
  // standard convention). Integer end to end: AUC_ppm =
  // Σ ΔFP·(TP+TP_prev) · 10⁶ div (2·P·N); the only window runs over
  // BINS, never documents. Gini = 2·AUC − 1 rides along.
  def evalAucBinned(s: SparkSession, d: String): DataFrame = {
    val q = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("logit_micro",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .select(col("doc_id"), expr("(logit_micro + 4000000L) div 25000L").as("bin"))
    val g = TextAnalysis.gopherRules(T.documents(s, d))
      .select(col("doc_id"), col("kept"))
    val bins = q.join(g, "doc_id")
      .groupBy("bin")
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("pos"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("neg"))
    val wCum = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("tp", sum(col("pos")).over(wCum))
      .withColumn("fp", sum(col("neg")).over(wCum))
      .withColumn("trap",
        col("neg") * (col("tp") + col("tp") - col("pos")))
      .agg(sum(col("pos")).as("p"), sum(col("neg")).as("n"),
        count(lit(1)).as("n_bins"), sum(col("trap")).as("trap2"))
      .select(col("p"), col("n"), col("n_bins"),
        expr("trap2 * 1000000L div (2L * p * n)").as("auc_ppm"),
        expr("(trap2 * 1000000L div (p * n)) - 1000000L").as("gini_ppm"))
  }

  private val oEvalAucBinned =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (-140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3 + 4000000)
       |      // 25000 AS bin
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |        * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |      CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |        * 1000000 // length(text) AS punct_ppm,
       |      CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |    FROM documents) t),
       |g AS (
       |  SELECT doc_id,
       |    ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
       |     AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
       |     AND (nstop >= 1)) AS kept
       |  FROM (
       |    SELECT doc_id,
       |      len(string_split(text, ' ')) AS n,
       |      length(replace(text, ' ', '')) AS wlen,
       |      length(text) - length(replace(text, '#', '')) AS nhash,
       |      (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
       |      len(list_filter(string_split(text, ' '),
       |          w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
       |      len(list_intersect(string_split(lower(text), ' '),
       |          ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS nstop
       |    FROM documents) m),
       |bins AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM q JOIN g USING (doc_id) GROUP BY bin),
       |cum AS (
       |  SELECT pos, neg,
       |    CAST(sum(pos) OVER (ORDER BY bin DESC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp
       |  FROM bins),
       |agg AS (
       |  SELECT CAST(sum(pos) AS BIGINT) AS p, CAST(sum(neg) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS n_bins,
       |    CAST(sum(neg * (tp + tp - pos)) AS BIGINT) AS trap2
       |  FROM cum)
       |SELECT p, n, n_bins,
       |  trap2 * 1000000 // (2 * p * n) AS auc_ppm,
       |  (trap2 * 1000000 // (p * n)) - 1000000 AS gini_ppm
       |FROM agg""".stripMargin

  // C116 (r10): Cohen's kappa — CHANCE-CORRECTED agreement between
  // the C53 decision and the C77 verdict (accuracy flatters any pair
  // that both say "keep" to a keep-heavy corpus; kappa subtracts the
  // agreement two independent raters with these marginals would get
  // for free). Exact rational arithmetic on the common denominator
  // T²: kappa = (po·T² − pe_num) / (T² − pe_num) with
  // pe_num = (tp+fp)(tp+fn) + (fn+tn)(fp+tn), emitted in integer ppm
  // — the one divide lands in the same place on both engines. Same
  // one-join + 1-row-agg shape as C112.
  def evalCohensKappa(s: SparkSession, d: String): DataFrame = {
    val q = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("pred",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L) > 0L)
      .select(col("doc_id"), col("pred"))
    val g = TextAnalysis.gopherRules(T.documents(s, d))
      .select(col("doc_id"), col("kept").as("actual"))
    q.join(g, "doc_id")
      .agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("actual"), 1L).otherwise(0L)).as("tn"))
      .withColumn("t", expr("tp + fp + fn + tn"))
      .withColumn("pe_num",
        expr("(tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000000L div t").as("accuracy_ppm"),
        // kappa ∈ [−1, 1]: shift the numerator by the denominator so
        // the integer divide runs on a NON-NEGATIVE operand (Spark
        // `div` truncates, DuckDB `//` floors — they agree only ≥ 0),
        // then shift back
        expr("(((tp + tn) * t - pe_num) + (t * t - pe_num)) * 1000000L " +
          "div (t * t - pe_num) - 1000000L").as("kappa_ppm"))
  }

  private val oEvalCohensKappa =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (-140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3) > 0 AS pred
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |        * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |      CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |        * 1000000 // length(text) AS punct_ppm,
       |      CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |    FROM documents) t),
       |g AS (
       |  SELECT doc_id,
       |    ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
       |     AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
       |     AND (nstop >= 1)) AS actual
       |  FROM (
       |    SELECT doc_id,
       |      len(string_split(text, ' ')) AS n,
       |      length(replace(text, ' ', '')) AS wlen,
       |      length(text) - length(replace(text, '#', '')) AS nhash,
       |      (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
       |      len(list_filter(string_split(text, ' '),
       |          w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
       |      len(list_intersect(string_split(lower(text), ' '),
       |          ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS nstop
       |    FROM documents) m),
       |c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM q JOIN g USING (doc_id)),
       |k AS (
       |  SELECT *, tp + fp + fn + tn AS t,
       |    (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS pe_num
       |  FROM c)
       |SELECT tp, fp, fn, tn,
       |  (tp + tn) * 1000000 // t AS accuracy_ppm,
       |  (((tp + tn) * t - pe_num) + (t * t - pe_num)) * 1000000
       |    // (t * t - pe_num) - 1000000 AS kappa_ppm
       |FROM k""".stripMargin

  // C117 (r11): Fleiss' kappa — chance-corrected agreement among n
  // raters (C116's Cohen handles exactly 2; labeling pipelines run
  // 3–5-way redundant annotation and report Fleiss over the item
  // pool). Binary categories: the input is one row per item with
  // n_pos ∈ [0, n] positive votes. Exact integer ppm throughout:
  //   P̄  = (A − Nn) / (Nn(n−1)),  A = Σᵢ (n_pos² + (n−n_pos)²)
  //   P̄e = B / (Nn)²,             B = C₁² + C₀²,  C₁ = Σ n_pos
  //   κ  = (P̄−P̄e)/(1−P̄e) = ((A−Nn)·Nn − B(n−1)) / ((n−1)((Nn)²−B))
  // (the last form divides num and den by the common Nn factor — the
  // raw cross-multiplied form would overflow Long at sf1.0). The κ
  // numerator can be negative (systematic disagreement), so it shifts
  // by the denominator before the floor-division — Spark `div`
  // truncates, DuckDB `//` floors; they agree only on non-negative
  // operands — and the ppm scale splits 10⁶ into 10³·10³ around the
  // division (exact; every intermediate ≤ ~2×10¹⁷ at sf1.0, Long-safe
  // to ~×40 that corpus). All-unanimous pools (den = 0: P̄e = 1) pin
  // κ to the 10⁶ ceiling.
  private[graft] def fleissKappaBinary(items: DataFrame, n: Int): DataFrame =
    items
      .agg(count(lit(1)).as("n_items"),
        sum(expr(s"n_pos * n_pos + ($n - n_pos) * ($n - n_pos)")).as("a_sum"),
        sum(col("n_pos")).as("c_pos"))
      .withColumn("c_neg", expr(s"n_items * $n - c_pos"))
      .withColumn("b_sum", expr("c_pos * c_pos + c_neg * c_neg"))
      .withColumn("den",
        expr(s"(${n - 1}) * (n_items * $n * n_items * $n - b_sum)"))
      .withColumn("nums",
        expr(s"(a_sum - n_items * $n) * n_items * $n - b_sum * ${n - 1} + den"))
      .select(col("n_items"), col("a_sum"), col("c_pos"),
        expr(s"(a_sum - n_items * $n) * 1000000L div (n_items * $n * ${n - 1})")
          .as("pbar_ppm"),
        expr(s"((b_sum * 1000L) div (n_items * $n * n_items * $n)) * 1000L + " +
          s"((b_sum * 1000L) % (n_items * $n * n_items * $n)) * 1000L div " +
          s"(n_items * $n * n_items * $n)").as("pe_ppm"),
        expr("""CASE WHEN den = 0 THEN 1000000L ELSE
                ((nums * 1000L) div den) * 1000L +
                ((nums * 1000L) % den) * 1000L div den - 1000000L END""")
          .as("kappa_ppm"))

  // The gated instance: 5 raters derived from the SAME integer
  // quality score Cohen's gate uses, at spread decision thresholds —
  // correlated-but-not-identical judgments, the realistic shape of a
  // redundant annotation pool.
  def evalFleissKappa(s: SparkSession, d: String): DataFrame = {
    val items = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("score",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .select(col("doc_id"),
        expr("""CAST(score > -100000L AS BIGINT) + CAST(score > -50000L AS BIGINT) +
                CAST(score > 0L AS BIGINT) + CAST(score > 50000L AS BIGINT) +
                CAST(score > 100000L AS BIGINT)""").as("n_pos"))
    fleissKappaBinary(items, 5)
  }

  private val oEvalFleissKappa =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (-140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3) AS score
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |        * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |      CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |        * 1000000 // length(text) AS punct_ppm,
       |      CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |    FROM documents) t),
       |r AS (
       |  SELECT doc_id,
       |    CAST(score > -100000 AS BIGINT) + CAST(score > -50000 AS BIGINT) +
       |    CAST(score > 0 AS BIGINT) + CAST(score > 50000 AS BIGINT) +
       |    CAST(score > 100000 AS BIGINT) AS n_pos
       |  FROM q),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(n_pos * n_pos + (5 - n_pos) * (5 - n_pos)) AS BIGINT) AS a_sum,
       |    CAST(sum(n_pos) AS BIGINT) AS c_pos
       |  FROM r),
       |k AS (
       |  SELECT *, n_items * 5 - c_pos AS c_neg FROM agg),
       |k2 AS (
       |  SELECT *, c_pos * c_pos + c_neg * c_neg AS b_sum FROM k),
       |k3 AS (
       |  SELECT *, 4 * (n_items * 5 * n_items * 5 - b_sum) AS den,
       |    (a_sum - n_items * 5) * n_items * 5 - b_sum * 4
       |      + 4 * (n_items * 5 * n_items * 5 - b_sum) AS nums
       |  FROM k2)
       |SELECT n_items, a_sum, c_pos,
       |  (a_sum - n_items * 5) * 1000000 // (n_items * 5 * 4) AS pbar_ppm,
       |  ((b_sum * 1000) // (n_items * 5 * n_items * 5)) * 1000 +
       |    ((b_sum * 1000) % (n_items * 5 * n_items * 5)) * 1000 //
       |    (n_items * 5 * n_items * 5) AS pe_ppm,
       |  CASE WHEN den = 0 THEN 1000000 ELSE
       |    ((nums * 1000) // den) * 1000 +
       |    ((nums * 1000) % den) * 1000 // den - 1000000 END AS kappa_ppm
       |FROM k3""".stripMargin

  // C113 (r10): temporal train/test split with an EMBARGO — the
  // leakage control time-series ML needs that C18's hash split and
  // C46's graph-closure split do not give: train strictly BEFORE the
  // cut, test strictly AFTER cut + embargo, the embargo window
  // DROPPED so near-boundary leakage (labels computed over a trailing
  // window crossing the cut) cannot happen. Cut/embargo are fixed
  // literals; assignment is one map-side comparison per row, and the
  // export aggregates per (split, event_type) with each split's time
  // extremes so the oracle re-proves the boundary invariants
  // train_max < cut ≤ embargo ≤ test_min — the CONTRACT, hashed.
  def splitTemporalQ(s: SparkSession, d: String): DataFrame = {
    val cutUs = 1705708800000000L      // 2024-01-20T00:00:00Z in µs
    val embargoUs = 3L * 86400000000L  // 3 days
    T.events(s, d)
      .select(col("event_type"), expr("ts div 1000").as("us"))
      .withColumn("split",
        when(col("us") < cutUs, "train")
          .when(col("us") >= cutUs + embargoUs, "test")
          .otherwise("embargo"))
      .groupBy("split", "event_type")
      .agg(count(lit(1)).as("n"),
        min(col("us")).as("min_us"), max(col("us")).as("max_us"))
      .orderBy("split", "event_type")
  }

  private val oSplitTemporal =
    """SELECT CASE WHEN epoch_us(ts) < 1705708800000000 THEN 'train'
      |  WHEN epoch_us(ts) >= 1705708800000000 + 3 * 86400000000 THEN 'test'
      |  ELSE 'embargo' END AS split,
      |  event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
      |FROM events
      |GROUP BY 1, 2 ORDER BY split, event_type""".stripMargin

  // C15: per-language corpus statistics — the profile report a
  // training-data pipeline emits per snapshot (doc counts, token
  // volume, token median, longest doc). Integer/median-exact outputs.
  def corpusStats(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(TextAnalysis.langId(col("text")).as("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("tokens"),
        length(col("text")).cast("bigint").as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("sum_tokens"),
        median(col("tokens")).as("median_tokens"),
        max(col("chars")).as("max_chars"))
      .orderBy("lang")

  private val oCorpusStats =
    s"""WITH lang AS ($oTextLangidBody),
       |tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |               CAST(length(text) AS BIGINT) AS chars
       |        FROM documents)
       |SELECT l.lang_pred AS lang, count(*) AS n_docs,
       |  CAST(sum(t.tokens) AS BIGINT) AS sum_tokens,
       |  median(t.tokens) AS median_tokens,
       |  max(t.chars) AS max_chars
       |FROM lang l JOIN tok t ON l.doc_id = t.doc_id
       |GROUP BY 1 ORDER BY lang""".stripMargin

  // C32 (r5; gate upgraded r9, was rows-only): incremental minhash
  // ingestion — two batches through the postings index. The pair set
  // is Spark-hash-seeded (not oracle-portable), so the gate exports
  // what IS: for every exact J≥0.5 truth pair (oracle re-derives it),
  // a found flag from the incremental path AND one from the one-shot
  // path — both measured 1 on this corpus (C4's 100%-recall fact),
  // and any divergence between the two paths (the OpsSpec
  // batch-order-equality law, here checked at the driver's SF on the
  // truth subset) flips a flag and fails the hash. Universe capped at
  // 500 docs (= full corpus at correctness SF); batch split at 250
  // keeps cross-batch pairs in play.
  def dedupMinhashIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).filter(col("doc_id") < 500)
    val empty = Dedup.minhashEntries(docs.limit(0))
    val (p1, e1) = Dedup.incrementalMinhash(docs.filter(col("doc_id") < 250), empty)
    val (p2, _) = Dedup.incrementalMinhash(docs.filter(col("doc_id") >= 250), e1)
    val inc = p1.unionByName(p2)
      .select(col("id_a"), col("id_b"), lit(1).as("i"))
    val oneShot = Dedup.minhashCandidates(docs)
      .select(col("id_a"), col("id_b"), lit(1).as("o"))
    jaccardTruthCached(s, d, 500, 0.5)
      .join(inc, Seq("id_a", "id_b"), "left")
      .join(oneShot, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        coalesce(col("i"), lit(0)).as("found_incremental"),
        coalesce(col("o"), lit(0)).as("found_oneshot"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val oDedupMinhashIncremental =
    oJaccardTruth(500, 0.5) +
      """
        |SELECT id_a, id_b, jaccard, 1 AS found_incremental, 1 AS found_oneshot
        |FROM truth ORDER BY id_a, id_b""".stripMargin

  // C31 (r5): the end-to-end quality gate — the kept corpus after
  // language/length/quality/repetition screening, one codegen'd
  // projection + filter over the scan (no shuffle, no joins).
  def corpusFiltered(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityFilter(T.documents(s, d)).orderBy(col("doc_id"))

  private val oCorpusFiltered =
    s"""WITH lang AS ($oTextLangidBody),
       |sig AS (SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  round(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t)))
       |        / len(string_split(text, ' '))
       |      + 1.0 / (1.0 + len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}'))), 6)
       |    AS quality_score,
       |  round(1 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |        / len(string_split(text, ' ')), 6) AS dup_word_frac
       |FROM documents)
       |SELECT s.doc_id, s.n_tokens, s.quality_score, s.dup_word_frac, l.lang_pred
       |FROM sig s JOIN lang l ON s.doc_id = l.doc_id
       |WHERE s.n_tokens >= 20 AND s.dup_word_frac <= 0.5
       |  AND s.quality_score >= 1.05 AND l.lang_pred <> 'und'
       |ORDER BY s.doc_id""".stripMargin

  // C9: quality metrics.
  def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .select("doc_id", "n_chars_m", "n_tokens", "punct_n", "stop_n", "quality_score")
      .orderBy(col("doc_id"))

  private val oTextQuality =
    s"""SELECT doc_id,
       |  length(text) AS n_chars_m,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS punct_n,
       |  len(list_filter(string_split(lower(text), ' '),
       |      t -> list_contains(${stopListSql("en")}, t))) AS stop_n,
       |  round(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t)))
       |        / len(string_split(text, ' '))
       |      + 1.0 / (1.0 + len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}'))), 6)
       |    AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin

  // C77: explicit Gopher rule screen — named per-rule booleans + the
  // conjunction; thresholds cross-multiplied so the keep decision is
  // pure integer arithmetic (see TextAnalysis.gopherRules). The
  // corpus splits 379 kept / 121 dropped at sf0.01 with every rule
  // contributing drops, so the oracle hash pins real decisions on
  // both sides of each threshold.
  def textGopherRules(s: SparkSession, d: String): DataFrame =
    TextAnalysis.gopherRules(T.documents(s, d)).orderBy(col("doc_id"))

  private val oTextGopherRules =
    """WITH m AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n,
      |    length(replace(text, ' ', '')) AS wlen,
      |    length(text) - length(replace(text, '#', '')) AS nhash,
      |    (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
      |    len(list_filter(string_split(text, ' '),
      |        w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
      |    len(list_intersect(string_split(lower(text), ' '),
      |        ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS nstop
      |  FROM documents)
      |SELECT doc_id, n AS n_words, wlen AS sum_word_len,
      |  (n >= 15 AND n <= 1000) AS r_word_count,
      |  (3 * n <= wlen AND wlen <= 5 * n) AS r_mean_word_len,
      |  (10 * (nhash + nell) < n) AS r_symbol_ratio,
      |  (5 * nalpha >= 4 * n) AS r_alpha_words,
      |  (nstop >= 1) AS r_stopwords,
      |  ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
      |   AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
      |   AND (nstop >= 1)) AS kept
      |FROM m ORDER BY doc_id""".stripMargin

  // C78: Flesch readability — milli-scaled integer FRE/FKGL so the
  // float coefficients never enter the contract; the oracle re-derives
  // word/sentence/syllable counts and the DIV arithmetic per doc, and
  // the corpus lands in ≥2 distinct bands so the CASE cut points are
  // exercised on real decisions.
  def textReadability(s: SparkSession, d: String): DataFrame =
    TextAnalysis.readability(T.documents(s, d)).orderBy(col("doc_id"))

  private val oTextReadability =
    """WITH m AS (
      |  SELECT doc_id,
      |    greatest(len(string_split(text, ' ')), 1) AS w,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
      |    greatest(len(regexp_extract_all(text, '[aeiouAEIOU]+')), 1) AS y
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
      |    206835 - (1015 * w) // s - (84600 * y) // w AS fre_milli,
      |    (390 * w) // s + (11800 * y) // w - 15590 AS fkgl_milli
      |  FROM m)
      |SELECT *, CASE WHEN fre_milli >= 90000 THEN 'very_easy'
      |  WHEN fre_milli >= 60000 THEN 'plain'
      |  WHEN fre_milli >= 30000 THEN 'difficult'
      |  ELSE 'very_difficult' END AS band
      |FROM r ORDER BY doc_id""".stripMargin

  // C80: Luhn-validated card redaction — the payment string is BUILT
  // from known columns (C56 discipline): a 15-digit PAN from doc_id
  // arithmetic, its Luhn check digit computed IN the query, and odd
  // doc_ids corrupted at a non-doubled position (Δsum = ±5, always
  // invalid) — so the corpus is half valid/half invalid and the
  // oracle re-derives the PAN, the check digit, the corruption, the
  // per-run Luhn verdicts, and the masked text character for
  // character. A short `ref` run rides along to pin the
  // candidate-length screen.
  def textLuhnScrub(s: SparkSession, d: String): DataFrame = {
    val pan = concat(lit("4"),
      lpad((col("doc_id") * 97 + 12345).cast("string"), 14, "0"))
    val s15 = aggregate(sequence(lit(1), lit(15)), lit(0), (acc, i) => {
      val dd = pan.substr(i, lit(1)).cast("int")
      acc + when(i % 2 === 1, lit(2) * dd - when(dd >= 5, 9).otherwise(0))
        .otherwise(dd)
    })
    val card0 = concat(pan, ((lit(10) - s15 % 10) % 10).cast("string"))
    val card = when(col("doc_id") % 2 === 1,
      concat(card0.substr(lit(1), lit(7)),
        ((card0.substr(lit(8), lit(1)).cast("int") + 5) % 10).cast("string"),
        card0.substr(lit(9), lit(8)))).otherwise(card0)
    val synth = T.documents(s, d).select(col("doc_id"),
      concat(lit("pay "), card, lit(" ref "), col("doc_id").cast("string"),
        lit(" end")).as("text"))
    TextAnalysis.luhnScrub(synth)
      .select("doc_id", "n_digit_runs", "n_candidates", "n_valid", "redacted")
      .orderBy("doc_id")
  }

  private val oTextLuhnScrub =
    """WITH c AS (
      |  SELECT doc_id,
      |    '4' || lpad(CAST(doc_id * 97 + 12345 AS VARCHAR), 14, '0') AS pan
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, pan || CAST(
      |    (10 - (list_sum(list_transform(range(1, 16), i ->
      |      CASE WHEN i % 2 = 1 THEN
      |        2 * CAST(substr(pan, i::int, 1) AS INT)
      |          - CASE WHEN CAST(substr(pan, i::int, 1) AS INT) >= 5
      |            THEN 9 ELSE 0 END
      |      ELSE CAST(substr(pan, i::int, 1) AS INT) END)) % 10)) % 10
      |    AS VARCHAR) AS card0
      |  FROM c),
      |mut AS (
      |  SELECT doc_id, CASE WHEN doc_id % 2 = 1 THEN
      |      substr(card0, 1, 7)
      |      || CAST((CAST(substr(card0, 8, 1) AS INT) + 5) % 10 AS VARCHAR)
      |      || substr(card0, 9, 8)
      |    ELSE card0 END AS card
      |  FROM k),
      |t AS (
      |  SELECT doc_id,
      |    'pay ' || card || ' ref ' || CAST(doc_id AS VARCHAR) || ' end' AS text
      |  FROM mut),
      |r AS (
      |  SELECT doc_id, text,
      |    regexp_extract_all(text, '[0-9]+') AS runs,
      |    list_filter(regexp_extract_all(text, '[0-9]+'),
      |      x -> length(x) BETWEEN 13 AND 19) AS cand
      |  FROM t),
      |v AS (
      |  SELECT doc_id, text, runs, cand,
      |    list_filter(cand, x ->
      |      (list_sum(list_transform(range(1, length(x) + 1), i ->
      |        CASE WHEN (length(x) - i) % 2 = 0
      |        THEN CAST(substr(x, i::int, 1) AS INT)
      |        ELSE 2 * CAST(substr(x, i::int, 1) AS INT)
      |          - CASE WHEN CAST(substr(x, i::int, 1) AS INT) >= 5
      |            THEN 9 ELSE 0 END END)) % 10) = 0) AS valid
      |  FROM r)
      |SELECT doc_id,
      |  CAST(len(runs) AS BIGINT) AS n_digit_runs,
      |  CAST(len(cand) AS BIGINT) AS n_candidates,
      |  CAST(len(valid) AS BIGINT) AS n_valid,
      |  list_reduce(list_prepend(text, valid),
      |    (a, b) -> replace(a, b, '[CARD]')) AS redacted
      |FROM v ORDER BY doc_id""".stripMargin

  // C81: cross-source n-gram duplication matrix — which sources
  // republish each other (TextAnalysis.crossSourceNgramOverlap doc).
  // The synthetic corpus's 20 sources share a varied, sparse 5-gram
  // matrix (~32 nonzero pairs at sf0.01 with counts from 1 to 143),
  // so the oracle hash pins real containment arithmetic, not a
  // degenerate all-zero or all-dense table.
  def textCrossSourceOverlap(s: SparkSession, d: String): DataFrame =
    TextAnalysis.crossSourceNgramOverlap(T.documents(s, d), n = 5)
      .orderBy(col("src_a"), col("src_b"))

  private val oTextCrossSourceOverlap =
    """WITH g AS (
      |  SELECT DISTINCT source, unnest(list_transform(
      |    range(0, greatest(0, len(string_split(text, ' ')) - 4)),
      |    i -> array_to_string(string_split(text, ' ')[i+1:i+5], ' '))) AS gram
      |  FROM documents),
      |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams
      |        FROM g GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT p.src_a, p.src_b, p.n_shared, ta.n_grams AS n_a,
      |  tb.n_grams AS n_b,
      |  p.n_shared * 1000000 // least(ta.n_grams, tb.n_grams) AS overlap_ppm
      |FROM pairs p
      |JOIN tot ta ON ta.source = p.src_a
      |JOIN tot tb ON tb.source = p.src_b
      |ORDER BY src_a, src_b""".stripMargin

  // C22 (r3): Gopher-style repetition signals — duplicate-word /
  // duplicate-trigram fractions and top-bigram coverage, the
  // pretrain-corpus repetition filters (see
  // TextAnalysis.repetitionSignals for the scale shape).
  def textRepetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetitionSignals(T.documents(s, d)).orderBy(col("doc_id"))

  private val oTextRepetition =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
      |topb AS (SELECT doc_id,
      |    round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS top_bigram_frac
      |  FROM (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY 1, 2) GROUP BY 1)
      |SELECT t.doc_id,
      |  round(1 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
      |    AS dup_word_frac,
      |  CASE WHEN len(toks) < 3 THEN 0.0
      |    ELSE round(1 - CAST(len(list_distinct(list_transform(
      |        generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS DOUBLE)
      |      / (len(toks) - 2), 6) END AS dup_trigram_frac,
      |  coalesce(topb.top_bigram_frac, 0.0) AS top_bigram_frac
      |FROM t LEFT JOIN topb USING (doc_id) ORDER BY doc_id""".stripMargin

  // C24 (r3): decontamination — corpus docs (doc_id < 400) sharing
  // any 8-gram with the synthetic benchmark slice (doc_id >= 400).
  def textDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    TextAnalysis.benchmarkOverlap(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400))
      .orderBy(col("doc_id"))
  }

  private val oTextDecontaminate = {
    val join8 = (0 until 8).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |cg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 7),
       |         i -> $join8)) AS gram
       |       FROM t WHERE doc_id < 400),
       |bg AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(toks) - 7),
       |         i -> $join8)) AS gram
       |       FROM t WHERE doc_id >= 400)
       |SELECT doc_id, count(DISTINCT gram) AS n_overlap
       |FROM cg JOIN bg USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // C25 (r4): the same screen behind the Bloom pre-filter — the
  // shuffle-minimizing scale path. Identical oracle: the filter only
  // prunes; the exact join decides.
  def textDecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    // expectedGrams: a known benchmark-size bound (the production
    // contract) — skips the sizing count; overestimating only pads
    // the filter (~1.2 MB per million grams at 1% fpp).
    TextAnalysis.benchmarkOverlapBloom(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        expectedGrams = Some(1L << 20))
      .orderBy(col("doc_id"))
  }

  // C29 (r5): the end-to-end filter — the corpus a pipeline keeps
  // after the screen: docs with ≤ 2 overlapping 8-grams survive,
  // n_overlap retained as provenance.
  def textDecontaminateFiltered(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    TextAnalysis.decontaminate(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        maxOverlap = 2L, expectedGrams = Some(1L << 20))
      .select(col("doc_id"), col("n_overlap"), length(col("text")).as("n_chars_m"))
      .orderBy(col("doc_id"))
  }

  private val oTextDecontaminateFiltered = {
    val join8 = (0 until 8).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
       |cg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 7),
       |         i -> $join8)) AS gram
       |       FROM t WHERE doc_id < 400),
       |bg AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(toks) - 7),
       |         i -> $join8)) AS gram
       |       FROM t WHERE doc_id >= 400),
       |ov AS (SELECT doc_id, count(DISTINCT gram) AS n_overlap
       |       FROM cg JOIN bg USING (gram) GROUP BY doc_id)
       |SELECT t.doc_id, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  length(t.text) AS n_chars_m
       |FROM t LEFT JOIN ov USING (doc_id)
       |WHERE t.doc_id < 400 AND coalesce(ov.n_overlap, 0) <= 2
       |ORDER BY t.doc_id""".stripMargin
  }

  // C27 (r4): CMS-pruned heavy hitters — exact counts, sketch-sized
  // shuffle (oracle is the plain GROUP BY/HAVING; identical results
  // because the CMS prune is one-sided).
  def textHeavyHitters(s: SparkSession, d: String): DataFrame =
    TextAnalysis.heavyHitters(T.documents(s, d), minCount = 100)
      .orderBy(col("tok"))

  private val oTextHeavyHitters =
    """SELECT tok, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok HAVING count(*) >= 100 ORDER BY tok""".stripMargin

  // C10: token counting (whitespace + BPE-ish regex).
  def textTokens(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy(col("doc_id"))

  private val oTextTokens =
    s"""SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
       |  len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}')) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // C39: char-trigram LM scoring — the integer evidence sums are the
  // hash-gated surface (float bits_per_char is spec-gated; log isn't
  // cross-engine bit-stable). Self-scoring: the model is the corpus.
  def textLmScore(s: SparkSession, d: String): DataFrame =
    TextAnalysis.charLmScore(T.documents(s, d))
      .select(col("doc_id"), col("n_pos"), col("sum_cg"), col("sum_cc"))
      .orderBy(col("doc_id"))

  private val oTextLmScore =
    """WITH raw AS (
      |  SELECT doc_id, unnest(list_transform(range(1, length(text) - 1),
      |    i -> substr(text, i::INT, 3))) AS g
      |  FROM documents WHERE length(text) >= 3),
      |pos AS (SELECT doc_id, g, substr(g, 1, 2) AS c FROM raw),
      |cg AS (SELECT g, count(*) AS cg FROM pos GROUP BY g),
      |cc AS (SELECT c, count(*) AS cc FROM pos GROUP BY c)
      |SELECT p.doc_id, count(*) AS n_pos,
      |  CAST(sum(cg.cg) AS BIGINT) AS sum_cg,
      |  CAST(sum(cc.cc) AS BIGINT) AS sum_cc
      |FROM pos p JOIN cg USING (g) JOIN cc USING (c)
      |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin

  // C42: frequency vocab + OOV — the tokenizer-coverage statistic;
  // K=1000 over the corpus, per-doc token/OOV counts hash-gated.
  def textVocabOov(s: SparkSession, d: String): DataFrame =
    TextAnalysis.oovStats(T.documents(s, d), 1000)
      .orderBy(col("doc_id"))

  private val oTextVocabOov =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |v AS (SELECT tok FROM (
      |        SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
      |        ORDER BY cnt DESC, tok LIMIT 1000))
      |SELECT t.doc_id, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |FROM tk t LEFT JOIN v ON t.tok = v.tok
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // C43: BPE merge-pair statistics — the per-round count of every
  // adjacent token pair, ranked to pick the next merge; top 100 with
  // deterministic (cnt DESC, a, b) tie-break.
  def textBpePairs(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bpePairStats(T.documents(s, d), 100)

  private val oTextBpePairs =
    """WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |pairs AS (
      |  SELECT ts[i] AS a, ts[i + 1] AS b
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g)
      |SELECT a, b, count(*) AS cnt FROM pairs
      |GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 100""".stripMargin

  // C119 (r11): vocabulary-growth (Heaps) curve — exact
  // (docs, cum tokens, distinct tokens) at 10 corpus-prefix
  // checkpoints in doc_id order: does more data still buy vocabulary?
  // (C42 is the static vocab+OOV readout; this is its growth over
  // ingest order.) See Vocab.vocabGrowthCurve for the scale shape
  // (doc-level window ∝ docs; vocab bucketed by first-doc against
  // broadcast thresholds — no per-checkpoint rescan).
  def vocabGrowth(s: SparkSession, d: String): DataFrame =
    Vocab.vocabGrowthCurve(T.documents(s, d), 10)

  private val oVocabGrowth =
    """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
      |o AS (SELECT doc_id, nt,
      |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn,
      |    CAST(sum(nt) OVER (ORDER BY doc_id) AS BIGINT) AS cum_nt FROM d),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
      |cp AS (SELECT CAST(k AS BIGINT) AS decile, (CAST(k AS BIGINT) * nd) // 10 AS ck
      |       FROM n, unnest(range(1, 11)) AS t(k)),
      |cpr AS (SELECT cp.decile, cp.ck AS n_docs, o.doc_id AS thr,
      |         o.cum_nt AS cum_tokens
      |        FROM cp JOIN o ON o.rn = cp.ck),
      |fd AS (SELECT tok, min(doc_id) AS md FROM (
      |         SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |           unnest(string_split(text, ' ')) AS tok FROM documents)
      |       GROUP BY tok)
      |SELECT c.decile, c.n_docs, c.cum_tokens,
      |  CAST(count(*) AS BIGINT) AS distinct_tokens
      |FROM cpr c JOIN fd ON fd.md <= c.thr
      |GROUP BY c.decile, c.n_docs, c.cum_tokens
      |ORDER BY c.decile""".stripMargin

  // C118 (r11): bigram next-token conditional table — per frequent
  // context, the argmax continuation + exact-ppm conditional
  // probability (the speculative-decoding drafter / n-gram baseline
  // table; C43 is the GLOBAL pair ranking for a merge pick, this is
  // the per-context conditional). minCtx=20 bounds the output to the
  // frequent-context vocabulary at any SF.
  def lmBigramNext(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bigramNextTable(T.documents(s, d), 20L)
      .orderBy(col("context"))

  private val oLmBigramNext =
    """WITH toks AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
      |pairs AS (
      |  SELECT ts[i] AS w1, ts[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
      |c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
      |      FROM pairs GROUP BY w1, w2),
      |t AS (SELECT w1, w2, pair_n,
      |        CAST(sum(pair_n) OVER (PARTITION BY w1) AS BIGINT) AS ctx_n,
      |        row_number() OVER (PARTITION BY w1 ORDER BY pair_n DESC, w2) AS rn
      |      FROM c)
      |SELECT w1 AS context, w2 AS top_next, pair_n AS top_n, ctx_n,
      |  pair_n * 1000000 // ctx_n AS prob_ppm
      |FROM t WHERE rn = 1 AND ctx_n >= 20 ORDER BY context""".stripMargin

  // C120 (r11): Kneser–Ney bigram statistics — the continuation-count
  // tables (N1+ — KN's "how many distinct contexts", not "how
  // frequent") + the interpolated probability at absolute discount
  // D = 3/4 in a pinned exact-floor integer form (≤ 2 ppm below
  // real-valued KN; see TextAnalysis.kneserNeyTable for the headroom
  // argument). C118 is the raw conditional argmax; this is the
  // SMOOTHED table an n-gram LM actually serves.
  def lmKneserNey(s: SparkSession, d: String): DataFrame =
    TextAnalysis.kneserNeyTable(T.documents(s, d), 20L)
      .orderBy(col("context"))

  private val oLmKneserNey =
    """WITH toks AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
      |pairs AS (
      |  SELECT ts[i] AS w1, ts[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
      |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
      |       FROM pairs GROUP BY w1, w2),
      |ctx AS (
      |  SELECT w1 AS context, CAST(sum(pair_n) AS BIGINT) AS c1,
      |    CAST(count(*) AS BIGINT) AS n_cont
      |  FROM pc GROUP BY w1),
      |top AS (
      |  SELECT w1 AS context, w2 AS top_next, pair_n AS c12,
      |    row_number() OVER (PARTITION BY w1 ORDER BY pair_n DESC, w2) AS rn
      |  FROM pc),
      |pred AS (SELECT w2 AS top_next, CAST(count(*) AS BIGINT) AS n_pred
      |         FROM pc GROUP BY w2),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM pc)
      |SELECT c.context, t.top_next, t.c12, c.c1, c.n_cont, p.n_pred, nb.n_big,
      |  ((4 * t.c12 - 3) * 1000000) // (4 * c.c1) +
      |  (3 * c.n_cont * ((p.n_pred * 1000000) // nb.n_big)) // (4 * c.c1)
      |    AS kn_ppm
      |FROM ctx c JOIN top t ON t.context = c.context AND t.rn = 1
      |JOIN pred p USING (top_next) CROSS JOIN nb
      |WHERE c.c1 >= 20
      |ORDER BY c.context""".stripMargin

  // C122 (r12): per-doc Kneser–Ney scoring — the CCNet-style fluency
  // readout the C120 table exists FOR: every document's bigram stream
  // scored against the corpus KN model, exported as exact integer
  // evidence (n_bigrams, sum_kn_ppm) + the floored avg ppm — the C39
  // discipline with word bigrams and smoothing (see
  // TextAnalysis.knPplScores for headroom + scale shape). Docs with
  // < 2 tokens have no scorable bigram and drop (the C39 contract).
  def textKnPpl(s: SparkSession, d: String): DataFrame =
    TextAnalysis.knPplScores(T.documents(s, d)).orderBy(col("doc_id"))

  // shared CTE block: the C120 pair-level kn_ppm generalized to every
  // (w1, w2) pair, then folded per document
  private val oKnDocBody =
    """toksk AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
      |          FROM documents),
      |posk AS (
      |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      |  FROM toksk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
      |pck AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
      |        FROM posk GROUP BY w1, w2),
      |ctxk AS (SELECT w1, CAST(sum(pair_n) AS BIGINT) AS c1,
      |           CAST(count(*) AS BIGINT) AS n_cont
      |         FROM pck GROUP BY w1),
      |predk AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_pred
      |          FROM pck GROUP BY w2),
      |nbk AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM pck),
      |kpk AS (
      |  SELECT pck.w1, pck.w2,
      |    ((4 * pair_n - 3) * 1000000) // (4 * c1) +
      |    (3 * n_cont * ((n_pred * 1000000) // nbk.n_big)) // (4 * c1)
      |      AS kn_ppm
      |  FROM pck JOIN ctxk USING (w1) JOIN predk USING (w2) CROSS JOIN nbk),
      |kn_doc AS (
      |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(kn_ppm) AS BIGINT) AS sum_kn_ppm,
      |    CAST(sum(kn_ppm) // count(*) AS BIGINT) AS avg_kn_ppm
      |  FROM posk p JOIN kpk USING (w1, w2) GROUP BY p.doc_id)""".stripMargin

  private val oTextKnPpl =
    s"""WITH $oKnDocBody
       |SELECT doc_id, n_bigrams, sum_kn_ppm, avg_kn_ppm
       |FROM kn_doc ORDER BY doc_id""".stripMargin

  // C122∘C31 (r12): the kept corpus after BOTH the C31 language/
  // length/quality/repetition screen AND the KN fluency band — the
  // composed end-to-end gate a CCNet-style curation pipeline actually
  // runs (screen on surface signals, then keep only docs whose word
  // transitions are corpus-typical). The 33 500 ppm floor sits inside
  // the observed avg_kn_ppm cluster at every SF (~45–60% kept), so
  // the hash pins real decisions on both sides; the compare is
  // integer-vs-integer — no float-boundary risk.
  def corpusKnFiltered(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    TextAnalysis.qualityFilter(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("lang_pred"))
      .join(TextAnalysis.knPplScores(docs), Seq("doc_id"))
      .filter(col("avg_kn_ppm") >= 33500L)
      .select(col("doc_id"), col("n_tokens"), col("lang_pred"),
        col("n_bigrams"), col("avg_kn_ppm"))
      .orderBy(col("doc_id"))
  }

  private val oCorpusKnFiltered =
    s"""WITH lang AS ($oTextLangidBody),
       |sig AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  round(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t)))
       |        / len(string_split(text, ' '))
       |      + 1.0 / (1.0 + len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}'))), 6)
       |    AS quality_score,
       |  round(1 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |        / len(string_split(text, ' ')), 6) AS dup_word_frac
       |FROM documents),
       |$oKnDocBody
       |SELECT s.doc_id, s.n_tokens, l.lang_pred, k.n_bigrams, k.avg_kn_ppm
       |FROM sig s JOIN lang l ON s.doc_id = l.doc_id
       |JOIN kn_doc k ON s.doc_id = k.doc_id
       |WHERE s.n_tokens >= 20 AND s.dup_word_frac <= 0.5
       |  AND s.quality_score >= 1.05 AND l.lang_pred <> 'und'
       |  AND k.avg_kn_ppm >= 33500
       |ORDER BY s.doc_id""".stripMargin

  // C123 (r12): Zipf rank–frequency + coverage curve — the vocabulary
  // in frequency order, read out at power-of-two ranks (plus the
  // final rank) with exact cumulative coverage in ppm: the
  // tokenizer-vocab-size curve ("how much corpus do the top 2^k types
  // cover?"). C119 is vocabulary growth over INGEST order; this is
  // mass over FREQUENCY order. Global rank/cumsum via the C74
  // partition-wise prefix (see Vocab.zipfCurve) — no single-task
  // window; the readout is a map-side bit test, output ∝ log₂(vocab).
  def vocabZipf(s: SparkSession, d: String): DataFrame =
    Vocab.zipfCurve(T.documents(s, d))

  private val oVocabZipf =
    """WITH v AS (SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |r AS (SELECT token, cnt,
      |  CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
      |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt FROM v),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
      |        CAST(count(*) AS BIGINT) AS nv FROM v)
      |SELECT rank, token, cnt, cum_cnt,
      |  cum_cnt * 1000000 // total AS coverage_ppm
      |FROM r, t WHERE (rank & (rank - 1)) = 0 OR rank = nv
      |ORDER BY rank""".stripMargin

  // C124 (r12): collocation mining via lift — bigrams beating the
  // independence expectation, the phrase-mining / multi-word-
  // expression pass. Lift preserves LLR's over-representation
  // ordering in pure integer arithmetic (see CorpusStats.collocations
  // for the pinned two-step floor form + Long headroom). The pair
  // table is the C120 checkpointed relation; the top-k is a
  // distributed TakeOrdered.
  def lmCollocations(s: SparkSession, d: String): DataFrame =
    CorpusStats.collocations(T.documents(s, d), minPair = 5L, k = 100)
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))

  private val oLmCollocations =
    """WITH toks AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
      |pairs AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
      |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
      |       FROM pairs GROUP BY w1, w2),
      |l AS (SELECT w1, CAST(sum(pair_n) AS BIGINT) AS c1 FROM pc GROUP BY w1),
      |r AS (SELECT w2, CAST(sum(pair_n) AS BIGINT) AS c2 FROM pc GROUP BY w2),
      |nb AS (SELECT CAST(sum(pair_n) AS BIGINT) AS n_big FROM pc)
      |SELECT pc.w1, pc.w2, pair_n, c1, c2,
      |  pair_n * 1000000 // c1 AS pyx_ppm,
      |  (pair_n * 1000000 // c1) * n_big // c2 AS lift_ppm
      |FROM pc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN nb
      |WHERE pair_n >= 5
      |ORDER BY lift_ppm DESC, w1, w2 LIMIT 100""".stripMargin

  // C125 (r12): term burstiness — per-term variance-to-mean ratio of
  // per-document counts (Church & Gale): content words burst, glue
  // words spread. Zero-count docs are in the distribution via the
  // moment identity VMR = Σc²/cf − cf/n_docs — never materialized
  // (see CorpusStats.termBurstiness for the pinned floor form).
  def termBurstiness(s: SparkSession, d: String): DataFrame =
    CorpusStats.termBurstiness(T.documents(s, d), minDf = 10L, k = 100)
      .orderBy(col("vmr_ppm").desc, col("token"))

  private val oTermBurstiness =
    """WITH pd AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM
      |  (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |   FROM documents)
      |  GROUP BY doc_id, tok),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |t AS (SELECT tok AS token, CAST(count(*) AS BIGINT) AS df,
      |        CAST(sum(c) AS BIGINT) AS cf, CAST(sum(c * c) AS BIGINT) AS s2
      |      FROM pd GROUP BY tok)
      |SELECT token, df, cf, s2,
      |  s2 * 1000000 // cf - cf * 1000000 // n_docs AS vmr_ppm
      |FROM t, nd WHERE df >= 10
      |ORDER BY vmr_ppm DESC, token LIMIT 100""".stripMargin

  // C127 (r12): per-source keyness — each source's most
  // over-represented tokens vs the rest of the corpus, as a staged
  // exact rate ratio (χ²/LLR keyness overflows integer widths at
  // corpus scale; the rate ratio preserves the per-source ordering —
  // see CorpusStats.sourceKeyness). The per-source top-k window runs
  // over the minCnt-filtered relation (≤ t_src/minCnt rows per
  // source), not the vocabulary.
  def sourceKeyness(s: SparkSession, d: String): DataFrame =
    CorpusStats.sourceKeyness(T.documents(s, d), minCnt = 10L, k = 5)
      .orderBy(col("source"), col("rk"))

  private val oSourceKeyness =
    """WITH st AS (SELECT source, tok AS token, CAST(count(*) AS BIGINT) AS a
      |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents)
      |  GROUP BY source, tok),
      |ts AS (SELECT source, CAST(sum(a) AS BIGINT) AS t_src
      |       FROM st GROUP BY source),
      |g AS (SELECT token, CAST(sum(a) AS BIGINT) AS g_tok
      |      FROM st GROUP BY token),
      |tt AS (SELECT CAST(sum(a) AS BIGINT) AS t_all FROM st),
      |e AS (SELECT st.source, st.token, a, g_tok - a AS b,
      |        t_all - t_src AS t_rest,
      |        a * 1000000 // t_src AS rate_s_ppm,
      |        (g_tok - a) * 1000000 // (t_all - t_src) AS rate_r_ppm,
      |        (a * 1000000 // t_src) * (t_all - t_src) // (g_tok - a)
      |          AS ratio_ppm
      |      FROM st JOIN ts USING (source) JOIN g USING (token) CROSS JOIN tt
      |      WHERE a >= 10 AND g_tok - a >= 1),
      |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
      |         ORDER BY ratio_ppm DESC, token) AS BIGINT) AS rk FROM e)
      |SELECT source, rk, token, a, b, rate_s_ppm, rate_r_ppm, ratio_ppm
      |FROM rk WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  // C126 (r12): MRR / Hit@k retrieval eval over the same BM25 run +
  // deterministic relevance labels as the C109 NDCG gate (rel =
  // doc_id·7 mod 4 ≥ 1) — the reciprocal-rank readout every retrieval
  // eval reports next to NDCG. Reciprocal ranks at k ≤ 10 are exact
  // ppm integers (10⁶ div rank), so no discount table is needed.
  // Evaluation state ∝ queries × k, never corpus.
  def evalMrr(s: SparkSession, d: String): DataFrame =
    Retrieval.bm25TopK(T.documents(s, d), col("doc_id"),
        split(lower(col("text")), " "),
        Seq(("q1", Seq("hash", "join")),
          ("q2", Seq("stream", "window", "merge")),
          ("q3", Seq("vector", "scan"))),
        k = 10)
      .withColumn("rel",
        expr("CASE WHEN (doc_id * 7) % 4 >= 1 THEN 1L ELSE 0L END"))
      .groupBy("query")
      .agg(sum(col("rel")).as("n_rel"),
        min(when(col("rel") === 1L, col("rk"))).as("__fr"),
        max(when(col("rel") === 1L && col("rk") <= 1, 1L).otherwise(0L))
          .as("hit1"),
        max(when(col("rel") === 1L && col("rk") <= 5, 1L).otherwise(0L))
          .as("hit5"),
        max(when(col("rel") === 1L && col("rk") <= 10, 1L).otherwise(0L))
          .as("hit10"))
      .withColumn("first_rel_rank", coalesce(col("__fr").cast("long"), lit(0L)))
      .withColumn("rr_ppm", expr(
        "CASE WHEN first_rel_rank > 0 THEN 1000000L div first_rel_rank ELSE 0L END"))
      .select("query", "n_rel", "first_rel_rank", "rr_ppm",
        "hit1", "hit5", "hit10")
      .orderBy("query")

  private lazy val oEvalMrr = {
    val bm25Body = oTextBm25.stripSuffix("ORDER BY query, rk")
      .replaceFirst(
        "(?s)SELECT query, rk, doc_id, score_nano FROM ranked\\s+WHERE rk <= 10\\s*$",
        "SELECT query, rk, doc_id FROM ranked WHERE rk <= 10")
    s"""WITH topk AS ($bm25Body),
       |rel AS (SELECT query, rk,
       |    CASE WHEN (doc_id * 7) % 4 >= 1 THEN 1 ELSE 0 END AS rel
       |  FROM topk)
       |SELECT query,
       |  CAST(sum(rel) AS BIGINT) AS n_rel,
       |  CAST(coalesce(min(CASE WHEN rel = 1 THEN rk END), 0) AS BIGINT)
       |    AS first_rel_rank,
       |  CAST(CASE WHEN min(CASE WHEN rel = 1 THEN rk END) IS NOT NULL
       |    THEN 1000000 // min(CASE WHEN rel = 1 THEN rk END)
       |    ELSE 0 END AS BIGINT) AS rr_ppm,
       |  CAST(max(CASE WHEN rel = 1 AND rk <= 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hit1,
       |  CAST(max(CASE WHEN rel = 1 AND rk <= 5 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hit5,
       |  CAST(max(CASE WHEN rel = 1 AND rk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hit10
       |FROM rel GROUP BY query ORDER BY query""".stripMargin
  }

  // C128 (r12): Poisson-bootstrap confidence interval for a
  // classifier metric — does the C53 quality classifier BEAT chance
  // against the C77 Gopher labels, with what uncertainty? The
  // classical bootstrap resamples with replacement (a global draw);
  // the Poisson bootstrap (the at-scale standard) gives every row an
  // independent deterministic Poisson(1) weight per replicate, so 40
  // resampled accuracies cost one map-side expression + a 40-row agg
  // (see CorpusStats.poissonBootstrapAccuracy for the pinned
  // threshold table + hash). The CI is read off the sorted replicate
  // rows. The oracle re-derives classifier, labels, weights, and all
  // 40 weighted accuracies.
  def evalBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val pred = TextAnalysis.qualityMetrics(docs, col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("pred", (lit(-140000L) + col("len_c") * lit(400L) +
        col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L)) > 0L)
      .select("doc_id", "pred")
    val lab = TextAnalysis.gopherRules(docs).select(col("doc_id"), col("kept"))
    val scored = pred.join(lab, "doc_id")
      .withColumn("correct",
        when(col("pred") === col("kept"), 1L).otherwise(0L))
    CorpusStats.poissonBootstrapAccuracy(scored, col("doc_id"),
        col("correct"), reps = 40)
      .orderBy("b")
  }

  private val oEvalBootstrapCi =
    s"""WITH cls AS (
       |  SELECT doc_id,
       |    (-140000 + least(len(string_split(text, ' ')), 500) * 400
       |     + (len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t)))
       |        * 1000000 // len(string_split(text, ' '))) * 2
       |     - (len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}'))
       |        * 1000000 // length(text)) * 3) > 0 AS pred
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n,
       |    length(replace(text, ' ', '')) AS wlen,
       |    length(text) - length(replace(text, '#', '')) AS nhash,
       |    (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
       |    len(list_filter(string_split(text, ' '),
       |        w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
       |    len(list_intersect(string_split(lower(text), ' '),
       |        ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS nstop
       |  FROM documents),
       |lab AS (
       |  SELECT doc_id,
       |    ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
       |     AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
       |     AND (nstop >= 1)) AS kept
       |  FROM g),
       |sc AS (SELECT c.doc_id,
       |         CASE WHEN c.pred = l.kept THEN 1 ELSE 0 END AS correct
       |       FROM cls c JOIN lab l USING (doc_id)),
       |reps AS (SELECT doc_id, correct, CAST(b AS BIGINT) AS b
       |         FROM sc, unnest(range(0, 40)) AS t(b)),
       |ws AS (SELECT b, correct,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
       |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
       |         WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
       |         WHEN u < 999999 THEN 8 ELSE 9 END AS w
       |  FROM (SELECT b, correct,
       |          ((doc_id % 1000000007 + b * 12289) % 1000000007
       |            * 554862419) % 1000000007 % 1000000 AS u
       |        FROM reps))
       |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |  CAST(sum(w * correct) AS BIGINT) AS n_correct_w,
       |  CAST(CASE WHEN sum(w) > 0
       |    THEN sum(w * correct) * 1000000 // sum(w) ELSE 0 END AS BIGINT)
       |    AS acc_ppm
       |FROM ws GROUP BY b ORDER BY b""".stripMargin

  // C129 (r12): exact-k per-stratum sample — "exactly 5 docs per
  // source, deterministically": the count-contract complement of
  // C20's rate-based downsample, built on the bounded-buffer
  // TopKByOrder so no stratum ever sorts its full membership (see
  // Packing.sampleExactK). The draw is the C34-family multiplicative
  // permutation at full resolution; the oracle re-derives membership,
  // rank, and draw values via a window over the same arithmetic.
  def sampleExactK(s: SparkSession, d: String): DataFrame =
    Packing.sampleExactK(T.documents(s, d), col("source"), col("doc_id"), 5)
      .orderBy("stratum", "rk")

  private val oSampleExactK =
    """WITH u AS (SELECT source AS stratum, doc_id,
      |    (doc_id % 1000000007) * 554862419 % 1000000007 AS u
      |  FROM documents),
      |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY stratum
      |         ORDER BY u, doc_id) AS BIGINT) AS rk FROM u)
      |SELECT stratum, rk, doc_id, u FROM rk WHERE rk <= 5
      |ORDER BY stratum, rk""".stripMargin

  // C130 (r12): water-filling token-budget allocation — cap dominant
  // sources at the common level τ where Σ min(c_s, τ) fits the
  // budget (max-min fair mixture construction; see
  // Packing.mixtureWaterfill for the exact integer k*/τ form). The
  // 26 000-token budget at sf0.01 funds 9 sources fully and caps 11
  // at τ = 1330, so the hash pins decisions on both sides of the
  // level; the oracle re-derives the prefix scan, k*, τ, and every
  // allocation.
  def mixtureWaterfillQ(s: SparkSession, d: String): DataFrame =
    Packing.mixtureWaterfill(T.documents(s, d), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long"), 26000L)
      .orderBy("source")

  private val oMixtureWaterfill =
    """WITH c AS (
      |  SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
      |  FROM documents GROUP BY source),
      |o AS (SELECT source, n_toks,
      |        CAST(row_number() OVER (ORDER BY n_toks, source) AS BIGINT) AS k,
      |        CAST(sum(n_toks) OVER (ORDER BY n_toks, source
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |        CAST(count(*) OVER () AS BIGINT) AS n,
      |        CAST(sum(n_toks) OVER () AS BIGINT) AS total
      |      FROM c),
      |star AS (SELECT coalesce(max(k), 0) AS ks, coalesce(max(cum), 0) AS cks
      |         FROM o WHERE cum + (n - k) * n_toks <= 26000),
      |tau AS (SELECT CASE WHEN (SELECT max(total) FROM o) <= 26000 THEN NULL
      |  ELSE (26000 - (SELECT cks FROM star))
      |         // ((SELECT max(n) FROM o) - (SELECT ks FROM star)) END AS tau)
      |SELECT o.source, o.n_toks,
      |  CASE WHEN tau.tau IS NULL OR o.k <= star.ks THEN o.n_toks
      |       ELSE least(o.n_toks, tau.tau) END AS alloc,
      |  CASE WHEN tau.tau IS NULL OR o.k <= star.ks THEN 1000000
      |       ELSE least(o.n_toks, tau.tau) * 1000000 // o.n_toks END AS alloc_ppm
      |FROM o, star, tau ORDER BY o.source""".stripMargin

  // C131 (r12): Krippendorff's alpha (nominal, binary) — the
  // agreement coefficient that HANDLES MISSING RATINGS, which is what
  // separates it from Cohen (C116, exactly 2 complete raters) and
  // Fleiss (C117, fixed rater count per item): real annotation
  // batches have raters that skip items. Three threshold raters on
  // the C53 integer quality score (θ = −50 000 / 0 / 50 000), each
  // deterministically skipping a different 20% of docs
  // ((doc_id + r) mod 5 = 0), so units carry m ∈ {2, 3} ratings and
  // single-rating units drop (Krippendorff's rule). Exact integer
  // form via the coincidence matrix: with S2 = Σ_u o_k·o_d·(2 div
  // (m_u−1)) (integer — m−1 ∈ {1, 2} divides 2), n = Σ m_u,
  // n_k + n_d = n:
  //
  //   alpha = 1 − S2·(n−1)/(2·n_k·n_d)
  //
  // pinned two-step floor: d1 = (S2·10⁶) div (2·n_k), alpha_ppm =
  // 10⁶ − (d1·(n−1)) div n_d. Long headroom: S2 ≤ 6·n_k (each keep
  // rating pairs with ≤ 2 others, coincidence factor ≤ 2) ⇒ d1 ≤
  // 3·10⁶, so d1·(n−1) is Long-safe to n ≈ 3·10¹² ratings. Scale:
  // the ratings relation is 3× docs (map-side explode), one per-doc
  // hash agg, one scalar reduce — no windows, no joins.
  def evalKrippendorff(s: SparkSession, d: String): DataFrame = {
    val score = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("score",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .select("doc_id", "score")
    val ratings = score
      .withColumn("r", explode(sequence(lit(1L), lit(3L))))
      .filter(expr("(doc_id + r) % 5 != 0"))
      .withColumn("keep", expr(
        "CAST(score > element_at(array(-50000L, 0L, 50000L), CAST(r AS INT)) AS BIGINT)"))
    krippendorffBinary(ratings)
  }

  /** Krippendorff's alpha over a binary `(doc_id, keep)` ratings
    * relation (multiple rows per doc = multiple raters; missing
    * ratings simply absent; units with < 2 ratings drop). See
    * [[evalKrippendorff]] for the exact-integer form and headroom.
    */
  private[graft] def krippendorffBinary(ratings: DataFrame): DataFrame =
    ratings.groupBy("doc_id")
      .agg(count(lit(1)).as("m"), sum(col("keep")).as("ok"))
      .filter(col("m") >= 2L)
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("m")).as("n"),
        sum(col("ok")).as("n_k"),
        sum(expr("ok * (m - ok) * (2L div (m - 1L))")).as("s2"))
      .withColumn("n_d", col("n") - col("n_k"))
      // Unanimity guard (ADVICE r12): n_k = 0 or n_d = 0 means every
      // kept rating is identical — the expected-disagreement
      // denominator is 0 and alpha is conventionally taken as perfect
      // agreement (s2 is necessarily 0 too). Pin alpha_ppm = 10⁶
      // instead of a null/div-by-zero, mirrored in the oracle.
      .withColumn("alpha_ppm", expr(
        "CASE WHEN n_k > 0 AND n_d > 0 THEN " +
        "1000000L - ((s2 * 1000000L div (2L * n_k)) * (n - 1L)) div n_d " +
        "ELSE 1000000L END"))
      .select("n_units", "n", "n_k", "n_d", "s2", "alpha_ppm")

  private val oEvalKrippendorff =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (-140000 + least(len(string_split(text, ' ')), 500) * 400
       |     + (len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t)))
       |        * 1000000 // len(string_split(text, ' '))) * 2
       |     - (len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}'))
       |        * 1000000 // length(text)) * 3) AS score
       |  FROM documents),
       |ratings AS (
       |  SELECT doc_id,
       |    CASE WHEN score > ([-50000, 0, 50000])[r] THEN 1 ELSE 0 END AS keep
       |  FROM q, unnest(range(1, 4)) AS t(r)
       |  WHERE (doc_id + r) % 5 != 0),
       |units AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(keep) AS BIGINT) AS ok
       |  FROM ratings GROUP BY doc_id HAVING count(*) >= 2),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_units,
       |    CAST(sum(m) AS BIGINT) AS n, CAST(sum(ok) AS BIGINT) AS n_k,
       |    CAST(sum(ok * (m - ok) * (2 // (m - 1))) AS BIGINT) AS s2
       |  FROM units)
       |SELECT n_units, n, n_k, n - n_k AS n_d, s2,
       |  CASE WHEN n_k > 0 AND n - n_k > 0 THEN
       |    1000000 - ((s2 * 1000000 // (2 * n_k)) * (n - 1)) // (n - n_k)
       |  ELSE 1000000 END AS alpha_ppm
       |FROM agg""".stripMargin

  // C132 (r12): rank-biased overlap between the lexical and the
  // fused ranking — Webber et al.'s top-weighted ranking-similarity
  // measure, the eval a retrieval stack runs to answer "how much did
  // fusion actually change the ranking?" (C109/C126 grade ONE ranking
  // against labels; RBO compares two rankings to each other, no
  // labels). Truncated RBO at depth k = 10 with persistence p = 1/2:
  // the weights are dyadic rationals, so the WHOLE measure is exact
  // integer arithmetic — rbo = Σ_d 2^(10−d)·Agr_d/(2^10−1) with
  // Agr_d = X_d/d, and swapping the order of summation turns the
  // prefix-overlap series into ONE pinned per-pair weight: a doc
  // ranked ra/rb in the two lists contributes W(max(ra, rb)) where
  // W(m) = Σ_{d≥m} 2^(10−d)·(2520/d) over the common denominator
  // 1023·2520 = 2 577 960 (2520 = lcm(1..10)). Identical rankings
  // sum to exactly 10⁶ ppm; disjoint to 0. Per-pair weights make the
  // whole eval one (query, doc) join + one agg — state ∝ queries × k.
  def evalRbo(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val emb = T.embeddings(s, d)
    // the lex list has TWO consumers (the RBO side and the fusion
    // input) — checkpoint the |queries|·k rows once so the corpus
    // BM25 subtree runs once, not twice (the C104 lesson; measured
    // ×10.1 → ×4-shape at the sf1.0 point)
    val lex = Retrieval.bm25TopK(docs, col("doc_id"),
      split(lower(col("text")), " "),
      Seq(("q1", Seq("hash", "join")),
        ("q2", Seq("stream", "window", "merge")),
        ("q3", Seq("vector", "scan"))),
      k = 10).select("query", "doc_id", "rk").localCheckpoint(true)
    val qvec = emb.filter(col("vec_id") < 3)
      .select(concat(lit("q"), (col("vec_id") + 1).cast("string")).as("query"),
        col("embedding"))
    val dense = Retrieval.denseRanks(qvec, emb, 10)
    val fused = Retrieval.rrfFuse(Seq(lex, dense), 10)
      .select("query", "doc_id", "rk")
    Retrieval.rbo(lex, fused).orderBy("query")
  }

  private lazy val oEvalRbo = {
    val body = oTextRrfFusion
      .replaceFirst(
        "(?s)SELECT query, CAST\\(rk AS INT\\) AS rk, doc_id, rrf_nano, n_systems FROM \\(",
        ", fused AS (SELECT query, rk, doc_id FROM (")
      .stripSuffix("WHERE rk <= 10 ORDER BY query, rk") +
      "WHERE rk <= 10)"
    s"""$body,
       |lextop AS (SELECT query, doc_id, rk FROM lex WHERE rk <= 10),
       |pairs AS (SELECT l.query, greatest(l.rk, f2.rk) AS m
       |          FROM lextop l JOIN fused f2 USING (query, doc_id)),
       |wt AS (SELECT query, CAST(count(*) AS BIGINT) AS n_common,
       |  CAST(sum(CASE m WHEN 1 THEN 1788440 WHEN 2 THEN 498200
       |    WHEN 3 THEN 175640 WHEN 4 THEN 68120 WHEN 5 THEN 27800
       |    WHEN 6 THEN 11672 WHEN 7 THEN 4952 WHEN 8 THEN 2072
       |    WHEN 9 THEN 812 ELSE 252 END) AS BIGINT) AS wsum
       |  FROM pairs GROUP BY query)
       |SELECT q.query, coalesce(wt.n_common, 0) AS n_common,
       |  coalesce(wt.wsum, 0) AS wsum,
       |  coalesce(wt.wsum, 0) * 1000000 // 2577960 AS rbo_ppm
       |FROM (SELECT DISTINCT query FROM lextop) q LEFT JOIN wt USING (query)
       |ORDER BY q.query""".stripMargin
  }

  // C133 (r12): language-consistency / code-switching screen — C8
  // labels the WHOLE doc; this labels each half independently and
  // flags disagreement, the cheap detector for concatenation
  // artifacts, template+content mixes, and code-switched documents
  // that a whole-doc argmax averages away (a multilingual curation
  // pipeline routes such docs to segment-level handling instead of a
  // single-language bucket). Same deterministic stop-score argmax as
  // C8 (first-max-in-fixed-order ties), applied to the first and
  // second token halves; docs under 8 tokens have no meaningful half
  // and drop. One codegen'd map pass — the halves are slices of the
  // already-split token array; no joins, no shuffle beyond the
  // output sort.
  def textLangConsistency(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
      .filter(size(col("ts")) >= 8)
      .withColumn("na", expr("size(ts) div 2"))
      .select(col("doc_id"),
        TextAnalysis.langId(expr("array_join(slice(ts, 1, na), ' ')"))
          .as("lang_a"),
        TextAnalysis.langId(
          expr("array_join(slice(ts, na + 1, size(ts) - na), ' ')"))
          .as("lang_b"))
      .withColumn("consistent", expr("CAST(lang_a = lang_b AS BIGINT)"))
      .orderBy("doc_id")

  private val oTextLangConsistency = {
    def scores(c: String, sfx: String) = TextAnalysis.Stopwords.map {
      case (l, _) =>
        s"len(list_filter(string_split($c, ' '), t -> list_contains(${stopListSql(l)}, t))) AS s_${l}_$sfx"
    }.mkString(",\n  ")
    val langs = TextAnalysis.Stopwords.map(_._1)
    def m(sfx: String) = langs.map(l => s"s_${l}_$sfx")
      .mkString("greatest(", ", ", ")")
    def pick(sfx: String) = langs.init
      .map(l => s"WHEN s_${l}_$sfx = m_$sfx THEN '$l'").mkString(" ")
    def langCase(sfx: String) =
      s"CASE WHEN m_$sfx = 0 THEN 'und' ${pick(sfx)} ELSE '${langs.last}' END"
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
       |           FROM documents),
       |h AS (SELECT doc_id,
       |  array_to_string(ts[1 : len(ts) // 2], ' ') AS ta,
       |  array_to_string(ts[len(ts) // 2 + 1 : len(ts)], ' ') AS tb
       |FROM t WHERE len(ts) >= 8),
       |sc AS (SELECT doc_id,
       |  ${scores("ta", "a")},
       |  ${scores("tb", "b")}
       |FROM h),
       |mm AS (SELECT *, ${m("a")} AS m_a, ${m("b")} AS m_b FROM sc)
       |SELECT doc_id, ${langCase("a")} AS lang_a, ${langCase("b")} AS lang_b,
       |  CAST((${langCase("a")}) = (${langCase("b")}) AS BIGINT) AS consistent
       |FROM mm ORDER BY doc_id""".stripMargin
  }

  // C134 (r13): exact multinomial Naive Bayes classifier — the
  // train-a-classifier slot (r12 verdict #3): C53 applies FIXED
  // weights; this one FITS per-class token counts against the C77
  // Gopher labels and scores every doc log-free on centered
  // class-conditional RATIOS in ppm (see CorpusStats.naiveBayesScores
  // for the model, the clamp, the measured 93–98 % fit, and the
  // Long-headroom bounds). Self-scoring over the training corpus,
  // the C39 discipline; the keep decision is require-asserted
  // non-vacuous (both classes present) like C53.
  def corpusNbClassifier(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
    // doc-sized scores, read twice (split check + output): checkpoint
    // once so the two token passes run once, not twice
    val m = CorpusStats.naiveBayesScores(docs, labels).localCheckpoint(true)
    val split = m.groupBy("nb_keep").count().collect()
    require(split.length == 2,
      s"NB classifier must split the corpus: ${split.mkString(",")}")
    m.orderBy(col("doc_id"))
  }

  /** Shared oracle CTE: the C77 Gopher labels every NB oracle trains
    * against (relation `g(doc_id, label)`).
    */
  private val oNbLabelsCte =
    s"""gm AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n,
       |    length(replace(text, ' ', '')) AS wlen,
       |    length(text) - length(replace(text, '#', '')) AS nhash,
       |    (length(text) - length(replace(text, '...', ''))) // 3 AS nell,
       |    len(list_filter(string_split(text, ' '),
       |        w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
       |    len(list_intersect(string_split(lower(text), ' '),
       |        ${stopListSql("en")})) AS nstop
       |  FROM documents),
       |g AS (SELECT doc_id,
       |  ((n >= 15 AND n <= 1000) AND (3 * n <= wlen AND wlen <= 5 * n)
       |   AND (10 * (nhash + nell) < n) AND (5 * nalpha >= 4 * n)
       |   AND (nstop >= 1)) AS label
       |  FROM gm)""".stripMargin

  /** Shared oracle body: Gopher labels → per-token class counts →
    * nano weights → per-doc margins (mirrors
    * `CorpusStats.naiveBayesScores` term for term).
    */
  private val oNbBody =
    s"""$oNbLabelsCte,
       |tkn AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents),
       |vc AS (SELECT tok,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c0
       |  FROM tkn JOIN g USING (doc_id) GROUP BY tok),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
       |    CAST(sum(c0) AS BIGINT) AS t0,
       |    CAST(count(*) AS BIGINT) AS v FROM vc),
       |wt AS (SELECT tok,
       |    least(greatest(((c1 + 1) * 1000000000 // (t1 + v)) * 1000000
       |        // ((c0 + 1) * 1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_ppm
       |  FROM vc, tot),
       |prn AS (SELECT
       |    (CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) + 1)
       |      * 1000000 // (count(*) + 2)
       |    - (CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) + 1)
       |      * 1000000 // (count(*) + 2) AS prior_ppm
       |  FROM g),
       |nbsc AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       |    CAST(sum(wt.w_ppm) AS BIGINT) AS evidence_ppm,
       |    prn.prior_ppm
       |  FROM tkn t JOIN wt USING (tok) CROSS JOIN prn
       |  GROUP BY t.doc_id, prn.prior_ppm)""".stripMargin

  private val oCorpusNbClassifier =
    s"""WITH $oNbBody
       |SELECT doc_id, n_toks, evidence_ppm, prior_ppm,
       |  evidence_ppm > 0 AS nb_keep
       |FROM nbsc ORDER BY doc_id""".stripMargin

  // C134∘C31 (r13): the composed keep-gate — the corpus kept after
  // BOTH the C31 surface screen AND the fitted NB classifier's keep
  // decision (the C122∘C31 pattern with a TRAINED score instead of
  // the KN fluency band): the CCNet loop closed in-engine —
  // train (C134) → score → gate, with C128's bootstrap available on
  // the resulting decisions.
  def corpusNbFiltered(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
    TextAnalysis.qualityFilter(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("lang_pred"))
      .join(CorpusStats.naiveBayesScores(docs, labels), Seq("doc_id"))
      .filter(col("nb_keep"))
      .select(col("doc_id"), col("n_tokens"), col("lang_pred"),
        col("evidence_ppm"))
      .orderBy(col("doc_id"))
  }

  private val oCorpusNbFiltered =
    s"""WITH lang AS ($oTextLangidBody),
       |sig AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  round(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t)))
       |        / len(string_split(text, ' '))
       |      + 1.0 / (1.0 + len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}'))), 6)
       |    AS quality_score,
       |  round(1 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |        / len(string_split(text, ' ')), 6) AS dup_word_frac
       |FROM documents),
       |$oNbBody
       |SELECT s.doc_id, s.n_tokens, l.lang_pred, k.evidence_ppm
       |FROM sig s JOIN lang l ON s.doc_id = l.doc_id
       |JOIN nbsc k ON s.doc_id = k.doc_id
       |WHERE s.n_tokens >= 20 AND s.dup_word_frac <= 0.5
       |  AND s.quality_score >= 1.05 AND l.lang_pred <> 'und'
       |  AND k.evidence_ppm > 0
       |ORDER BY s.doc_id""".stripMargin

  // C134∘C128 (r13): train → score → CI, closed in-engine — the
  // Poisson-bootstrap confidence interval over the FITTED NB
  // classifier's agreement with its Gopher training labels (C128 runs
  // the same readout over C53's fixed weights; this is the fitted
  // counterpart the r12 verdict asked the classifier stack to
  // complete). Self-scored training fit, so the CI brackets the
  // resubstitution accuracy (93–98 %); a deployment would point the
  // same composition at a held-out split (C18/C113).
  def evalNbBootstrap(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    // checkpoint ONCE here: the label relation feeds both the trainer
    // and the agreement join — an un-checkpointed second consumer
    // would recompute gopherRules over the corpus (r13 ADVICE)
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
      .localCheckpoint(true)
    val scored = CorpusStats.naiveBayesScores(docs, labels)
      .join(labels, "doc_id")
      .withColumn("correct",
        when(col("nb_keep") === col("label"), 1L).otherwise(0L))
    CorpusStats.poissonBootstrapAccuracy(scored, col("doc_id"),
        col("correct"), reps = 40)
      .orderBy("b")
  }

  private val oEvalNbBootstrap =
    s"""WITH $oNbBody,
       |scn AS (SELECT n.doc_id,
       |    CASE WHEN (n.evidence_ppm > 0) = g.label THEN 1 ELSE 0 END
       |      AS correct
       |  FROM nbsc n JOIN g USING (doc_id)),
       |reps AS (SELECT doc_id, correct, CAST(b AS BIGINT) AS b
       |         FROM scn, unnest(range(0, 40)) AS t(b)),
       |ws AS (SELECT b, correct,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
       |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
       |         WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
       |         WHEN u < 999999 THEN 8 ELSE 9 END AS w
       |  FROM (SELECT b, correct,
       |          ((doc_id % 1000000007 + b * 12289) % 1000000007
       |            * 554862419) % 1000000007 % 1000000 AS u
       |        FROM reps))
       |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |  CAST(sum(w * correct) AS BIGINT) AS n_correct_w,
       |  CAST(CASE WHEN sum(w) > 0
       |    THEN sum(w * correct) * 1000000 // sum(w) ELSE 0 END AS BIGINT)
       |    AS acc_ppm
       |FROM ws GROUP BY b ORDER BY b""".stripMargin

  // C136 = C134∘C18 (r14, verdict #1): HELD-OUT NB scoring — the
  // deployment shape. corpus_nb_classifier is self-scoring (every
  // token in-vocabulary by construction, CI brackets resubstitution
  // accuracy); this trains on the C18 deterministic mod-prime HALF
  // (bucket < 500 — "score the held-out half", engine-reproducible,
  // oracle-rederivable at any SF) and scores the OTHER half, where
  // vocabulary misses are real and take the smoothed Laplace-floor
  // weight (see CorpusStats.naiveBayesScoresHoldout for the floor
  // form and headroom). The C46 leakage-safe variant is a drop-in
  // swap (bucket the rep_id instead of the doc_id); the gated split
  // uses the C18 bucket because the oracle must re-derive the split
  // at the ×10 point too, and C46's all-pairs truth chain is already
  // separately gated at its own declared cap.
  //
  // The driver corpus's two halves share one vocabulary at every SF
  // (measured: 0 natural misses at sf0.01 AND sf0.1), so with natural
  // text the floor path would never fire under the gate. The score
  // side therefore appends a deterministic per-doc OOV pair
  // (` oov<id>x oov<id>x` — digits can't collide with the generator
  // vocabulary; the text_scrub injected-fixture precedent): every
  // held-out doc carries exactly 2 occurrences of 1 unseen token,
  // pinning BOTH the occurrence count and the floor weight hash-exact
  // in the oracle. Gopher labels grade the ORIGINAL text.
  private def oovSuffix(c: Column): Column =
    concat(c, lit(" oov"), col("doc_id"), lit("x oov"), col("doc_id"),
      lit("x"))

  def corpusNbHoldout(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val bucket = Packing.permilleBucket(col("doc_id"))
    // labels over ALL docs, checkpointed once: the trainer's inner
    // join restricts to the train half, the output join grades the
    // held-out half
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
      .localCheckpoint(true)
    CorpusStats.naiveBayesScoresHoldout(
        docs.filter(bucket < lit(500L)), labels,
        docs.filter(bucket >= lit(500L))
          .withColumn("text", oovSuffix(col("text"))))
      .join(labels, "doc_id")
      .withColumn("correct", col("nb_keep") === col("label"))
      .select("doc_id", "n_toks", "n_unseen", "evidence_ppm", "nb_keep",
        "label", "correct")
      .orderBy(col("doc_id"))
  }

  /** Shared holdout-oracle body: C18 bucket split → train-half class
    * counts → weights + the Laplace-floor unseen weight → held-out
    * per-doc scores (mirrors `CorpusStats.naiveBayesScoresHoldout`
    * term for term; relation `hsc`).
    */
  private val oNbHoldoutBody =
    s"""$oNbLabelsCte,
       |bkt AS (SELECT doc_id,
       |    ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
       |  FROM documents),
       |tkn AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents),
       |vc AS (SELECT tok,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c0
       |  FROM tkn JOIN g USING (doc_id) JOIN bkt USING (doc_id)
       |  WHERE bkt.b < 500 GROUP BY tok),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
       |    CAST(sum(c0) AS BIGINT) AS t0,
       |    CAST(count(*) AS BIGINT) AS v FROM vc),
       |wt AS (SELECT tok,
       |    least(greatest(((c1 + 1) * 1000000000 // (t1 + v)) * 1000000
       |        // ((c0 + 1) * 1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_ppm
       |  FROM vc, tot),
       |wu AS (SELECT
       |    least(greatest((1000000000 // (t1 + v)) * 1000000
       |        // (1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_unseen_ppm
       |  FROM tot),
       |tkh AS (SELECT doc_id, unnest(string_split(lower(
       |          text || ' oov' || doc_id || 'x oov' || doc_id || 'x'),
       |        ' ')) AS tok
       |        FROM documents),
       |hsc AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       |    CAST(sum(CASE WHEN wt.w_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_unseen,
       |    CAST(sum(coalesce(wt.w_ppm, wu.w_unseen_ppm)) AS BIGINT)
       |      AS evidence_ppm
       |  FROM tkh t JOIN bkt USING (doc_id) LEFT JOIN wt USING (tok)
       |       CROSS JOIN wu
       |  WHERE bkt.b >= 500
       |  GROUP BY t.doc_id)""".stripMargin

  private val oCorpusNbHoldout =
    s"""WITH $oNbHoldoutBody
       |SELECT doc_id, h.n_toks, h.n_unseen, h.evidence_ppm,
       |  h.evidence_ppm > 0 AS nb_keep, g.label,
       |  (h.evidence_ppm > 0) = g.label AS correct
       |FROM hsc h JOIN g USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // C136∘C128 (r14): held-out accuracy CI — eval_nb_bootstrap
  // re-pointed at the HELD-OUT decisions (verdict #1's "report
  // held-out accuracy next to the resubstitution CI"): the same
  // 40-replicate Poisson bootstrap over correctness, but correctness
  // is now graded on docs the trainer never saw, unseen-token floor
  // included. Read next to eval_nb_bootstrap: the gap between the two
  // intervals IS the resubstitution optimism.
  def evalNbHoldoutCi(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val bucket = Packing.permilleBucket(col("doc_id"))
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
      .localCheckpoint(true)
    val scored = CorpusStats.naiveBayesScoresHoldout(
        docs.filter(bucket < lit(500L)), labels,
        docs.filter(bucket >= lit(500L))
          .withColumn("text", oovSuffix(col("text"))))
      .join(labels, "doc_id")
      .withColumn("correct",
        when(col("nb_keep") === col("label"), 1L).otherwise(0L))
    CorpusStats.poissonBootstrapAccuracy(scored, col("doc_id"),
        col("correct"), reps = 40)
      .orderBy("b")
  }

  private val oEvalNbHoldoutCi =
    s"""WITH $oNbHoldoutBody,
       |scn AS (SELECT h.doc_id,
       |    CASE WHEN (h.evidence_ppm > 0) = g.label THEN 1 ELSE 0 END
       |      AS correct
       |  FROM hsc h JOIN g USING (doc_id)),
       |reps AS (SELECT doc_id, correct, CAST(b AS BIGINT) AS b
       |         FROM scn, unnest(range(0, 40)) AS t(b)),
       |ws AS (SELECT b, correct,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
       |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
       |         WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
       |         WHEN u < 999999 THEN 8 ELSE 9 END AS w
       |  FROM (SELECT b, correct,
       |          ((doc_id % 1000000007 + b * 12289) % 1000000007
       |            * 554862419) % 1000000007 % 1000000 AS u
       |        FROM reps))
       |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |  CAST(sum(w * correct) AS BIGINT) AS n_correct_w,
       |  CAST(CASE WHEN sum(w) > 0
       |    THEN sum(w * correct) * 1000000 // sum(w) ELSE 0 END AS BIGINT)
       |    AS acc_ppm
       |FROM ws GROUP BY b ORDER BY b""".stripMargin

  // C134∘C106 (r14, verdict #4): the calibration readout over the NB
  // evidence — "is the 93–98 % fit well-calibrated across the
  // evidence range, or all concentrated at the clamp?" Equi-width
  // DECILES of the observed evidence_ppm range (1-row min/max
  // broadcast; width floored ≥1 so the bin index lands in [0,9] by
  // construction); per bin: doc count, Gopher-kept rate, and
  // nb_keep↔label agreement, all exact ppm. A usable soft score shows
  // kept_ppm rising monotonically with the bin and agreement dipping
  // only in the sign-boundary bin; a gate-only score shows agreement
  // concentrated at the extremes. The bin key is non-negative before
  // the integer divide (shifted by min), so Spark's truncating `div`
  // and DuckDB's flooring `//` agree — the B89 discipline.
  def evalNbCalibration(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
      .localCheckpoint(true)
    // doc-sized decision relation, 2 consumers (range agg + binning):
    // checkpoint once so the token passes run once
    val scored = CorpusStats.naiveBayesScores(docs, labels)
      .join(labels, "doc_id")
      .select(col("doc_id"), col("evidence_ppm"), col("nb_keep"),
        col("label"))
      .localCheckpoint(true)
    val rng = scored.agg(min("evidence_ppm").as("min_ev"),
        max("evidence_ppm").as("max_ev"))
      .withColumn("bin_w",
        expr("greatest((max_ev - min_ev) div 10L + 1L, 1L)"))
      .select("min_ev", "bin_w")
    scored.crossJoin(broadcast(rng)) // 1-row range broadcast
      .withColumn("bin", expr("(evidence_ppm - min_ev) div bin_w"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("nb_keep") === col("label"), 1L).otherwise(0L))
          .as("n_agree"),
        min("evidence_ppm").as("ev_lo"),
        max("evidence_ppm").as("ev_hi"))
      .withColumn("kept_ppm", expr("n_kept * 1000000L div n"))
      .withColumn("agree_ppm", expr("n_agree * 1000000L div n"))
      .select("bin", "n", "n_kept", "kept_ppm", "n_agree", "agree_ppm",
        "ev_lo", "ev_hi")
      .orderBy("bin")
  }

  private val oEvalNbCalibration =
    s"""WITH $oNbBody,
       |j AS (SELECT n.doc_id, n.evidence_ppm,
       |    n.evidence_ppm > 0 AS nb_keep, g.label
       |  FROM nbsc n JOIN g USING (doc_id)),
       |rng AS (SELECT min(evidence_ppm) AS min_ev,
       |    greatest((max(evidence_ppm) - min(evidence_ppm)) // 10 + 1, 1)
       |      AS bin_w
       |  FROM j)
       |SELECT (evidence_ppm - min_ev) // bin_w AS bin,
       |  count(*) AS n,
       |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) * 1000000 // count(*)
       |    AS BIGINT) AS kept_ppm,
       |  CAST(sum(CASE WHEN nb_keep = label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_agree,
       |  CAST(sum(CASE WHEN nb_keep = label THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS agree_ppm,
       |  min(evidence_ppm) AS ev_lo, max(evidence_ppm) AS ev_hi
       |FROM j CROSS JOIN rng
       |GROUP BY 1 ORDER BY bin""".stripMargin

  // C137 = C136 ∘ k-fold (r14): 5-fold cross-validated NB accuracy —
  // the model-selection readout after C136's single holdout: one
  // held-out point estimates generalization, k folds estimate its
  // VARIANCE (is 98.8 % a stable property of the recipe or luck of
  // one split?). Folds are the C18 permille bucket div 200
  // (deterministic, engine-reproducible at any SF); every doc is
  // scored exactly once, by the model trained on the other 4 folds,
  // with vocabulary misses taking that fold's Laplace floor and the
  // C136 per-doc OOV fixture keeping the floor path live in the gate.
  // The whole k-fold pass is ONE relational job (fold-keyed training
  // stream, no driver loop) — see CorpusStats.naiveBayesKfoldScores
  // for the ×(k−1) cost contract and per-fold headroom.
  def evalNbKfold(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
      .localCheckpoint(true)
    val fold = (Packing.permilleBucket(col("doc_id")) / lit(200)).cast("long")
    CorpusStats.naiveBayesKfoldScores(docs, labels, 5, fold,
        trainText = col("text"), scoreText = oovSuffix(col("text")))
      .join(labels, "doc_id")
      .groupBy("fold")
      .agg(count(lit(1)).as("n"),
        sum(when(col("nb_keep") === col("label"), 1L).otherwise(0L))
          .as("n_correct"),
        sum("n_unseen").as("n_unseen"))
      .withColumn("acc_ppm", expr("n_correct * 1000000L div n"))
      .select("fold", "n", "n_correct", "acc_ppm", "n_unseen")
      .orderBy("fold")
  }

  private val oEvalNbKfold =
    s"""WITH $oNbLabelsCte,
       |bkt AS (SELECT doc_id,
       |    ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
       |  FROM documents),
       |fl AS (SELECT CAST(f AS BIGINT) AS f FROM unnest(range(0, 5)) t(f)),
       |tkn AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents),
       |vc AS (SELECT fl.f, tok,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c0
       |  FROM tkn JOIN g USING (doc_id) JOIN bkt USING (doc_id)
       |  CROSS JOIN fl WHERE bkt.b // 200 <> fl.f GROUP BY fl.f, tok),
       |tot AS (SELECT f, CAST(sum(c1) AS BIGINT) AS t1,
       |    CAST(sum(c0) AS BIGINT) AS t0,
       |    CAST(count(*) AS BIGINT) AS v FROM vc GROUP BY f),
       |wt AS (SELECT f, tok,
       |    least(greatest(((c1 + 1) * 1000000000 // (t1 + v)) * 1000000
       |        // ((c0 + 1) * 1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_ppm
       |  FROM vc JOIN tot USING (f)),
       |wu AS (SELECT f,
       |    least(greatest((1000000000 // (t1 + v)) * 1000000
       |        // (1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_unseen_ppm
       |  FROM tot),
       |tkh AS (SELECT doc_id, bkt.b // 200 AS f,
       |    unnest(string_split(lower(
       |      text || ' oov' || doc_id || 'x oov' || doc_id || 'x'),
       |      ' ')) AS tok
       |  FROM documents JOIN bkt USING (doc_id)),
       |hsc AS (SELECT t.doc_id, t.f, CAST(count(*) AS BIGINT) AS n_toks,
       |    CAST(sum(CASE WHEN wt.w_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_unseen,
       |    CAST(sum(coalesce(wt.w_ppm, wu.w_unseen_ppm)) AS BIGINT)
       |      AS evidence_ppm
       |  FROM tkh t LEFT JOIN wt ON wt.f = t.f AND wt.tok = t.tok
       |       JOIN wu ON wu.f = t.f
       |  GROUP BY t.doc_id, t.f)
       |SELECT h.f AS fold, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN (h.evidence_ppm > 0) = g.label
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(sum(CASE WHEN (h.evidence_ppm > 0) = g.label
       |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS acc_ppm,
       |  CAST(sum(h.n_unseen) AS BIGINT) AS n_unseen
       |FROM hsc h JOIN g USING (doc_id)
       |GROUP BY h.f ORDER BY fold""".stripMargin

  // C138 = C136 ∘ split-conformal (r14): the DISTRIBUTION-FREE
  // keep-gate — C136 reports accuracy, this op turns the scores into
  // a gate with a marginal guarantee: at most α of TRUE-KEEP docs are
  // dropped (in expectation, under exchangeability of the hash
  // split). Standard split conformal: train on bucket<500, calibrate
  // on [500,750), test on [750,1000); nonconformity s = −evidence;
  // the threshold is the ⌈(1−α)(n_cal+1)⌉-th smallest calibration s
  // over TRUE-KEEP calibration docs (α = 0.1), and a test doc is kept
  // iff its s ≤ threshold. The rank selection runs through
  // Prefix.globalRank (the C74 partition-wise prefix — no
  // single-task window over the calibration relation); if the rank
  // exceeds n_cal the threshold is +∞ and everything keeps (the small
  // -n edge, exercised at sf0.001). Output is the 1-row deployment
  // report: threshold, and the measured test-side false-drop rate the
  // guarantee bounds.
  def evalNbConformal(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val bucket = Packing.permilleBucket(col("doc_id"))
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").as("label"))
      .localCheckpoint(true)
    // doc-sized decisions over cal+test, 2 consumers (cal rank, test
    // gate): checkpoint once so the train+score token passes run once
    val scored = CorpusStats.naiveBayesScoresHoldout(
        docs.filter(bucket < lit(500L)), labels,
        docs.filter(bucket >= lit(500L)))
      .join(labels, "doc_id")
      .withColumn("b", Packing.permilleBucket(col("doc_id")))
      .localCheckpoint(true)
    val cal = scored.filter(col("b") < lit(750L) && col("label"))
      .select(col("doc_id"), (-col("evidence_ppm")).as("s"))
    val (thr, nCal, kRank) =
      CorpusStats.conformalThreshold(cal, alphaPpm = 100000L)
    scored.filter(col("b") >= lit(750L))
      .crossJoin(broadcast(thr)) // 1-row threshold broadcast
      .withColumn("cp_keep", -col("evidence_ppm") <= col("thr_s"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("cp_keep"), 1L).otherwise(0L)).as("n_test_keep"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_test_true"),
        sum(when(col("label") && !col("cp_keep"), 1L).otherwise(0L))
          .as("n_false_drop"),
        min("thr_s").as("thr_s"))
      .withColumn("alpha_ppm", lit(100000L))
      .withColumn("n_cal", lit(nCal))
      .withColumn("k_rank", lit(kRank))
      .withColumn("false_drop_ppm", expr(
        "CASE WHEN n_test_true > 0" +
          " THEN n_false_drop * 1000000L div n_test_true ELSE 0L END"))
      .select("alpha_ppm", "n_cal", "k_rank", "thr_s", "n_test",
        "n_test_keep", "n_test_true", "n_false_drop", "false_drop_ppm")
  }

  private val oEvalNbConformal =
    s"""WITH $oNbLabelsCte,
       |bkt AS (SELECT doc_id,
       |    ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
       |  FROM documents),
       |tkn AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents),
       |vc AS (SELECT tok,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c0
       |  FROM tkn JOIN g USING (doc_id) JOIN bkt USING (doc_id)
       |  WHERE bkt.b < 500 GROUP BY tok),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
       |    CAST(sum(c0) AS BIGINT) AS t0,
       |    CAST(count(*) AS BIGINT) AS v FROM vc),
       |wt AS (SELECT tok,
       |    least(greatest(((c1 + 1) * 1000000000 // (t1 + v)) * 1000000
       |        // ((c0 + 1) * 1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_ppm
       |  FROM vc, tot),
       |wu AS (SELECT
       |    least(greatest((1000000000 // (t1 + v)) * 1000000
       |        // (1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_unseen_ppm
       |  FROM tot),
       |csc AS (SELECT t.doc_id,
       |    CAST(sum(coalesce(wt.w_ppm, wu.w_unseen_ppm)) AS BIGINT)
       |      AS evidence_ppm
       |  FROM tkn t JOIN bkt USING (doc_id) LEFT JOIN wt USING (tok)
       |       CROSS JOIN wu
       |  WHERE bkt.b >= 500 GROUP BY t.doc_id),
       |j AS (SELECT c.doc_id, c.evidence_ppm, g.label, bkt.b
       |  FROM csc c JOIN g USING (doc_id) JOIN bkt USING (doc_id)),
       |cal AS (SELECT doc_id, -evidence_ppm AS s FROM j
       |        WHERE b < 750 AND label),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
       |    CAST((900000 * (count(*) + 1) + 999999) // 1000000 AS BIGINT)
       |      AS k_rank FROM cal),
       |rkd AS (SELECT s, row_number() OVER (ORDER BY s, doc_id) AS rn
       |        FROM cal),
       |thr AS (SELECT CASE WHEN k.k_rank > k.n_cal
       |      THEN 9223372036854775807
       |      ELSE (SELECT s FROM rkd, kk WHERE rn = k_rank) END AS thr_s
       |  FROM kk k),
       |tst AS (SELECT j.doc_id, j.label,
       |    (-j.evidence_ppm <= t.thr_s) AS cp_keep
       |  FROM j CROSS JOIN thr t WHERE j.b >= 750)
       |SELECT CAST(100000 AS BIGINT) AS alpha_ppm, k.n_cal, k.k_rank,
       |  CAST(t.thr_s AS BIGINT) AS thr_s,
       |  CAST(count(*) AS BIGINT) AS n_test,
       |  CAST(sum(CASE WHEN cp_keep THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_test_keep,
       |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_test_true,
       |  CAST(sum(CASE WHEN label AND NOT cp_keep THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_false_drop,
       |  CAST(CASE WHEN sum(CASE WHEN label THEN 1 ELSE 0 END) > 0
       |    THEN sum(CASE WHEN label AND NOT cp_keep THEN 1 ELSE 0 END)
       |      * 1000000 // sum(CASE WHEN label THEN 1 ELSE 0 END)
       |    ELSE 0 END AS BIGINT) AS false_drop_ppm
       |FROM tst CROSS JOIN kk k CROSS JOIN thr t
       |GROUP BY k.n_cal, k.k_rank, t.thr_s""".stripMargin

  // C139 (r14): NB model introspection — the per-class top
  // discriminative tokens a deployment INSPECTS before shipping a
  // trained filter (is the classifier keying on content words or on
  // markup artifacts / PII-shaped tokens?): the fitted weight table
  // with its per-token support exposed (CorpusStats.nbModel), a
  // support floor (c1+c0 ≥ 20 — below it the Laplace clamp dominates
  // and rank order is noise), top 25 keep-indicating (w_ppm desc) and
  // top 25 drop-indicating (w_ppm asc) tokens, ties broken by token.
  // Both top-k cuts are orderBy+limit — distributed TakeOrdered (the
  // C59 movers discipline), never a vocab-sized single-task window;
  // no rank column is exported (rank = read order) so the op needs no
  // window at all.
  def corpusNbFeatures(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val labels = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("kept").cast("boolean").as("label"))
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok"))
    val (m, _) = CorpusStats.nbModel(toks, labels)
    val sup = m.filter(col("c1") + col("c0") >= lit(20L))
    val keepTop = sup.orderBy(col("w_ppm").desc, col("tok").asc)
      .limit(25).withColumn("side", lit("keep"))
    val dropTop = sup.orderBy(col("w_ppm").asc, col("tok").asc)
      .limit(25).withColumn("side", lit("drop"))
    keepTop.unionByName(dropTop)
      .select("side", "tok", "c1", "c0", "w_ppm")
      .orderBy("side", "w_ppm", "tok")
  }

  private val oCorpusNbFeatures =
    s"""WITH $oNbLabelsCte,
       |tkn AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents),
       |vc AS (SELECT tok,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c0
       |  FROM tkn JOIN g USING (doc_id) GROUP BY tok),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
       |    CAST(sum(c0) AS BIGINT) AS t0,
       |    CAST(count(*) AS BIGINT) AS v FROM vc),
       |wtc AS (SELECT tok, c1, c0,
       |    least(greatest(((c1 + 1) * 1000000000 // (t1 + v)) * 1000000
       |        // ((c0 + 1) * 1000000000 // (t0 + v)), 15625), 64000000)
       |      - 1000000 AS w_ppm
       |  FROM vc, tot),
       |sup AS (SELECT tok, c1, c0, w_ppm FROM wtc WHERE c1 + c0 >= 20),
       |kp AS (SELECT 'keep' AS side, tok, c1, c0, w_ppm FROM sup
       |       ORDER BY w_ppm DESC, tok LIMIT 25),
       |dr AS (SELECT 'drop' AS side, tok, c1, c0, w_ppm FROM sup
       |       ORDER BY w_ppm ASC, tok LIMIT 25)
       |SELECT side, tok, c1, c0, w_ppm FROM kp
       |UNION ALL SELECT side, tok, c1, c0, w_ppm FROM dr
       |ORDER BY side, w_ppm, tok""".stripMargin

  // C141 (r14): Matryoshka truncation eval — the dimension/cost dial
  // readout for MRL-style embeddings (use the first d' dims of a
  // 64-dim vector; how much recall does each truncation keep?): for
  // d' ∈ {8,16,32,64}, exact cosine top-5 on the truncated prefix vs
  // the full-dim top-5, recall = overlap. The full-dim row is the
  // identity (recall 10⁶) by construction — a gate-side sanity pin.
  // Same query/candidate split, codegen'd cosine and (sim DESC, id)
  // tie-break as C6; cost = |dims| brute-force passes over the C6
  // workload (queries ≪ corpus — the broadcast side).
  def embedMatryoshkaEval(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val wk = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    def topk(dim: Int): DataFrame =
      q.crossJoin(c)
        .withColumn("sim", Similarity.cosine(
          expr(s"slice(qe, 1, $dim)"), expr(s"slice(ce, 1, $dim)")))
        .withColumn("rnk", row_number().over(wk))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("neighbor_id"))
    // full-dim reference read twice (3 overlap joins + its own row):
    // bounded (queries·k rows), checkpoint once
    val full = topk(64).localCheckpoint(true)
    Seq(8, 16, 32, 64).map { dm =>
      val t = if (dm == 64) full else topk(dm)
      t.join(full, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(t.agg(count(lit(1)).as("n")))
        .withColumn("dim", lit(dm.toLong))
    }.reduce(_.unionByName(_))
      .withColumn("recall_ppm", expr("n_hits * 1000000L div n"))
      .select("dim", "n", "n_hits", "recall_ppm")
      .orderBy("dim")
  }

  private val oEmbedMatryoshkaEval =
    """WITH dims AS (SELECT CAST(dm AS BIGINT) AS dim
      |             FROM unnest([8, 16, 32, 64]) t(dm)),
      |tk AS (SELECT dim, query_id, neighbor_id FROM (
      |    SELECT d.dim, q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY d.dim, q.vec_id
      |        ORDER BY list_cosine_similarity(
      |            CAST(q.embedding[1:CAST(d.dim AS INT)] AS DOUBLE[]),
      |            CAST(c.embedding[1:CAST(d.dim AS INT)] AS DOUBLE[])) DESC,
      |                 c.vec_id) AS rnk
      |    FROM embeddings q JOIN embeddings c
      |      ON q.vec_id < 10 AND c.vec_id >= 10
      |    CROSS JOIN dims d) t
      |  WHERE rnk <= 5),
      |fl AS (SELECT query_id, neighbor_id FROM tk WHERE dim = 64)
      |SELECT t.dim, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hits,
      |  CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS recall_ppm
      |FROM tk t LEFT JOIN fl f
      |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
      |GROUP BY t.dim ORDER BY dim""".stripMargin

  // C142 (r14): binary sign quantization + Hamming search — the
  // 32×-compression end of the embedding-quantization dial (C66 is
  // int8 = 4×; this is 1 bit/dim): sign bits packed into two 32-bit
  // words (NOT one 64-bit word — shiftleft(1, 63) overflows Long
  // under ANSI arithmetic in-engine and bigint in the oracle; two
  // half-words keep every partial sum positive and portable),
  // distance = popcount(xor) over the words — all integers, so the
  // gate is hash-exact INCLUDING the distance values (the float ANN
  // gates can only export rank decisions). Top-5 per query by
  // (hamming ASC, id), each row carrying whether the float cosine
  // top-5 also contains it — the per-neighbor recall readout.
  def embedQuantizeBinary(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    def packWord(off: Int) =
      s"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
        s"IF(element_at(embedding, i + ${off + 1}) > 0, shiftleft(1L, i), 0L))"
    val packed = e.selectExpr("vec_id", "embedding",
      s"${packWord(0)} AS b_lo", s"${packWord(32)} AS b_hi")
    val q = packed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("b_lo").as("q_lo"), col("b_hi").as("q_hi"))
    val c = packed.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("b_lo").as("c_lo"), col("b_hi").as("c_hi"))
    val wh = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("neighbor_id"))
    val hamTop = q.crossJoin(c)
      .withColumn("hamming", expr(
        "cast(bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi) as bigint)"))
      .withColumn("rnk", row_number().over(wh))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    val floatTop = q.select("query_id", "qe").crossJoin(
        c.select("neighbor_id", "ce"))
      .withColumn("sim", Similarity.cosine(col("qe"), col("ce")))
      .withColumn("rnk", row_number().over(wc))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("in_float_top5"))
    hamTop.join(floatTop, Seq("query_id", "neighbor_id"), "left")
      .withColumn("in_float_top5",
        coalesce(col("in_float_top5"), lit(false)))
      .select("query_id", "neighbor_id", "hamming", "in_float_top5")
      .orderBy("query_id", "neighbor_id")
  }

  private val oEmbedQuantizeBinary =
    """WITH pk AS (SELECT vec_id, embedding,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN embedding[CAST(i + 1 AS INT)] > 0
      |        THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END))
      |      AS BIGINT) AS b_lo,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN embedding[CAST(i + 33 AS INT)] > 0
      |        THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END))
      |      AS BIGINT) AS b_hi
      |  FROM embeddings),
      |ham AS (SELECT query_id, neighbor_id, hamming FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      CAST(bit_count(xor(q.b_lo, c.b_lo))
      |         + bit_count(xor(q.b_hi, c.b_hi)) AS BIGINT) AS hamming,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY bit_count(xor(q.b_lo, c.b_lo))
      |               + bit_count(xor(q.b_hi, c.b_hi)), c.vec_id) AS rnk
      |    FROM pk q JOIN pk c ON q.vec_id < 10 AND c.vec_id >= 10) t
      |  WHERE rnk <= 5),
      |ft AS (SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        CAST(c.embedding AS DOUBLE[])) DESC,
      |                 c.vec_id) AS rnk
      |    FROM embeddings q JOIN embeddings c
      |      ON q.vec_id < 10 AND c.vec_id >= 10) t
      |  WHERE rnk <= 5)
      |SELECT h.query_id, h.neighbor_id, h.hamming,
      |  (f.neighbor_id IS NOT NULL) AS in_float_top5
      |FROM ham h LEFT JOIN ft f
      |  ON h.query_id = f.query_id AND h.neighbor_id = f.neighbor_id
      |ORDER BY h.query_id, h.neighbor_id""".stripMargin

  // C143 (r14): IVF index-health stats — the WHEN-to-retrain readout
  // the C16 frontier assumes away (the frontier prices a GOOD index;
  // this measures whether the index IS good): per-centroid list size,
  // corpus share, and quantization error (mean/max centered cosine
  // distance of members to their centroid, clamped then FLOORED to
  // ppm per member before the integer sum — per-element rounding
  // keeps the aggregate engine-exact, the cents idiom). Skewed shares
  // → salt or re-train; high residual → more centroids. Same centroid
  // rule and argmax-cosine assignment as C16 (`Similarity.ivfIndex` —
  // the persisted-index shape), so this audits exactly the index
  // ann_ivf serves from.
  def annIvfStats(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = e.filter(col("vec_id") >= 10 && col("vec_id") < 42)
    val cent = centroids.select(col("vec_id").as("cid"),
      col("embedding").as("emb_cent"))
    val lists = Similarity.ivfIndex(corpus, centroids)
    val tot = corpus.agg(count(lit(1)).as("n_total"))
    lists.join(broadcast(cent), "cid")
      .withColumn("cos", Similarity.cosine(col("emb_c"), col("emb_cent")))
      .withColumn("dist_ppm", expr(
        "cast(floor((1.0d - least(greatest(cos, -1.0d), 1.0d))" +
          " * 1000000.0d) as bigint)"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        sum("dist_ppm").as("sum_dist_ppm"),
        max("dist_ppm").as("max_dist_ppm"))
      .crossJoin(broadcast(tot)) // 1-row total broadcast
      .withColumn("share_ppm", expr("n_vecs * 1000000L div n_total"))
      .withColumn("avg_dist_ppm", expr("sum_dist_ppm div n_vecs"))
      .select("cid", "n_vecs", "share_ppm", "avg_dist_ppm", "max_dist_ppm")
      .orderBy("cid")
  }

  private val oAnnIvfStats =
    """WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
      |              WHERE vec_id >= 10 AND vec_id < 42),
      |corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
      |assign AS (
      |  SELECT neighbor_id, cid, dist_ppm FROM (
      |    SELECT c.vec_id AS neighbor_id, ct.cid,
      |      CAST(floor((1.0 - least(greatest(
      |          list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                 CAST(ct.embedding AS DOUBLE[])),
      |          -1.0), 1.0)) * 1000000.0) AS BIGINT) AS dist_ppm,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                        CAST(ct.embedding AS DOUBLE[])) DESC,
      |                 ct.cid) AS r
      |    FROM corp c CROSS JOIN cent ct) t WHERE r = 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM corp)
      |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(count(*) * 1000000 // n_total AS BIGINT) AS share_ppm,
      |  CAST(sum(dist_ppm) // count(*) AS BIGINT) AS avg_dist_ppm,
      |  CAST(max(dist_ppm) AS BIGINT) AS max_dist_ppm
      |FROM assign CROSS JOIN tot
      |GROUP BY cid, n_total ORDER BY cid""".stripMargin

  // C135 (r13): segment-level language routing — C133's consumer
  // (r12 verdict #5): C133 FLAGS code-switched docs; this op ACTS on
  // the flag. Every flagged doc (half-langids disagree, the C133
  // predicate) is cut into fixed 16-token windows, each window gets
  // the C8 stop-score argmax label, and maximal runs of consecutive
  // same-label windows collapse into SEGMENTS (gaps-and-islands on
  // the window index) — emitting (doc_id, seg_idx, lang, n_windows,
  // n_tokens, seg_text), each segment routable to its language
  // bucket. Fixed-stride windows, not sentences: the router must work
  // on punctuation-free text, and a fixed stride makes the contract
  // engine-portable with zero injected fixtures.
  //
  // Scale shape: the flag + window explode are one map pass ∝ flagged
  // tokens; the islands window and the segment agg are partitioned by
  // doc_id — per-doc state, never a global window. seg_text
  // reassembles deterministically from (w_idx, wtext) structs via
  // array_sort (Spark) / ORDER BY inside string_agg (DuckDB).
  def textSegmentLangid(s: SparkSession, d: String): DataFrame = {
    val W = 16
    val flagged = T.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
      .filter(size(col("ts")) >= 8)
      .withColumn("na", expr("size(ts) div 2"))
      .withColumn("lang_a",
        TextAnalysis.langId(expr("array_join(slice(ts, 1, na), ' ')")))
      .withColumn("lang_b",
        TextAnalysis.langId(
          expr("array_join(slice(ts, na + 1, size(ts) - na), ' ')")))
      .filter(col("lang_a") =!= col("lang_b"))
    val win = flagged
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(0), expr(s"(size(ts) - 1) div $W"))).as("w_idx"))
      .withColumn("wtext",
        expr(s"array_join(slice(ts, w_idx * $W + 1, $W), ' ')"))
      .withColumn("w_n",
        expr(s"least(size(ts) - w_idx * $W, $W)").cast("long"))
      .withColumn("lang", TextAnalysis.langId(col("wtext")))
      .select("doc_id", "w_idx", "wtext", "w_n", "lang")
    val byDoc = Window.partitionBy("doc_id").orderBy("w_idx")
    win
      .withColumn("prev", lag("lang", 1).over(byDoc))
      .withColumn("chg",
        when(col("prev").isNull || col("lang") =!= col("prev"), 1L)
          .otherwise(0L))
      .withColumn("seg_idx", sum("chg").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "seg_idx", "lang")
      .agg(count(lit(1)).as("n_windows"), sum("w_n").as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("w_idx"), col("wtext")))),
          x => x.getField("wtext")), " ").as("seg_text"))
      .orderBy("doc_id", "seg_idx")
  }

  private val oTextSegmentLangid = {
    def scores(c: String, sfx: String) = TextAnalysis.Stopwords.map {
      case (l, _) =>
        s"len(list_filter(string_split($c, ' '), t -> list_contains(${stopListSql(l)}, t))) AS s_${l}_$sfx"
    }.mkString(",\n  ")
    val langs = TextAnalysis.Stopwords.map(_._1)
    def m(sfx: String) = langs.map(l => s"s_${l}_$sfx")
      .mkString("greatest(", ", ", ")")
    def pick(sfx: String) = langs.init
      .map(l => s"WHEN s_${l}_$sfx = m_$sfx THEN '$l'").mkString(" ")
    def langCase(sfx: String) =
      s"CASE WHEN m_$sfx = 0 THEN 'und' ${pick(sfx)} ELSE '${langs.last}' END"
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
       |           FROM documents),
       |h AS (SELECT doc_id, ts,
       |  array_to_string(ts[1 : len(ts) // 2], ' ') AS ta,
       |  array_to_string(ts[len(ts) // 2 + 1 : len(ts)], ' ') AS tb
       |FROM t WHERE len(ts) >= 8),
       |sc AS (SELECT doc_id, ts,
       |  ${scores("ta", "a")},
       |  ${scores("tb", "b")}
       |FROM h),
       |mm AS (SELECT *, ${m("a")} AS m_a, ${m("b")} AS m_b FROM sc),
       |flag AS (SELECT doc_id, ts FROM mm
       |         WHERE (${langCase("a")}) <> (${langCase("b")})),
       |w AS (SELECT doc_id, CAST(i AS BIGINT) AS w_idx,
       |    array_to_string(ts[i * 16 + 1 : least((i + 1) * 16, len(ts))], ' ')
       |      AS wtext,
       |    CAST(least(len(ts) - i * 16, 16) AS BIGINT) AS w_n
       |  FROM flag,
       |    LATERAL (SELECT unnest(generate_series(0, (len(ts) - 1) // 16)) AS i) g),
       |ws AS (SELECT doc_id, w_idx, wtext, w_n,
       |  ${scores("wtext", "w")}
       |FROM w),
       |wl AS (SELECT doc_id, w_idx, wtext, w_n,
       |    ${langCase("w")} AS lang
       |  FROM (SELECT *, ${m("w")} AS m_w FROM ws) q),
       |chg AS (SELECT doc_id, w_idx, wtext, w_n, lang,
       |    CASE WHEN lag(lang) OVER (PARTITION BY doc_id ORDER BY w_idx)
       |      IS DISTINCT FROM lang THEN 1 ELSE 0 END AS is_chg
       |  FROM wl),
       |seg AS (SELECT doc_id, w_idx, wtext, w_n, lang,
       |    CAST(sum(is_chg) OVER (PARTITION BY doc_id ORDER BY w_idx
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_idx
       |  FROM chg)
       |SELECT doc_id, seg_idx, lang,
       |  CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(w_n) AS BIGINT) AS n_tokens,
       |  string_agg(wtext, ' ' ORDER BY w_idx) AS seg_text
       |FROM seg GROUP BY doc_id, seg_idx, lang
       |ORDER BY doc_id, seg_idx""".stripMargin
  }

  // C43 (merge application): the corpus rewritten by ONE BPE merge —
  // the top pair by (cnt DESC, a, b) — then per-doc md5 + token count.
  // The winning pair is vocab-sized driver state (a 1-row collect,
  // like a config); the rewrite itself is a pure codegen'd map. The
  // oracle re-derives the same winner in a CTE and re-expresses the
  // identical double-space replace construction, so a semantics
  // mismatch in greedy pairing breaks the hash.
  def textBpeMerge(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val top = TextAnalysis.bpePairStats(docs, 1).select("a", "b").head()
    val (a, b) = (top.getString(0), top.getString(1))
    docs.select(col("doc_id"),
        TextAnalysis.applyBpeMerge(col("text"), a, b).as("m"))
      .select(col("doc_id"), md5(col("m")).as("text_md5"),
        size(TextAnalysis.tokens(col("m"))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  private val oTextBpeMerge =
    """WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |pairs AS (
      |  SELECT ts[i] AS a, ts[i + 1] AS b
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
      |top AS (SELECT a, b FROM (
      |  SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b
      |  ORDER BY cnt DESC, a, b LIMIT 1)),
      |merged AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(
      |      replace(' ' || replace(text, ' ', '  ') || ' ',
      |        ' ' || (SELECT a FROM top) || '  ' || (SELECT b FROM top) || ' ',
      |        ' ' || (SELECT a FROM top) || '+' || (SELECT b FROM top) || ' '),
      |      ' +', ' ', 'g')) AS m
      |  FROM documents)
      |SELECT doc_id, md5(m) AS text_md5,
      |  CAST(len(string_split(m, ' ')) AS BIGINT) AS n_tokens
      |FROM merged ORDER BY doc_id""".stripMargin

  // C82: the multi-round BPE trainer — SIX chained count→argmax→merge
  // rounds (TextAnalysis.bpeTrain doc); the exported artifact is the
  // merge table itself. The oracle replays all six rounds as chained
  // CTEs — pair counts over the current corpus, the same (cnt DESC,
  // a, b) winner, the same double-space greedy rewrite — so a drift
  // in ANY round's counts, tie-break, or merge semantics cascades
  // into every later round and breaks the hash.
  def textBpeTrain(s: SparkSession, d: String): DataFrame = {
    val merges = TextAnalysis.bpeTrain(T.documents(s, d), rounds = 6)
    import s.implicits._
    merges.toDF("round", "a", "b", "cnt").orderBy("round")
  }

  /** One DuckDB BPE round: pair counts over t{k−1} (t0 = documents),
    * deterministic winner w$k, rewritten corpus t$k. Mirrors
    * `TextAnalysis.bpeTrain`'s loop body term for term.
    *
    * Every CTE is MATERIALIZED: t(k) is referenced twice (by p(k+1)
    * and t(k+1)), so DuckDB's default CTE inlining re-evaluates the
    * whole regexp-rewrite chain 2^rounds times — 653 s at sf0.01 vs
    * 0.5 s materialized (measured). The oracle board must stay cheap
    * or the driver's correctness run times out (see the empty
    * CORRECTNESS_r09.json post-mortem).
    */
  private def oBpeRound(k: Int): String = {
    val prev = if (k == 1) "documents" else s"t${k - 1}"
    s"""p$k AS MATERIALIZED (
       |  SELECT ts[i] AS a, ts[i + 1] AS b
       |  FROM (SELECT string_split(text, ' ') AS ts FROM $prev) tk$k,
       |    LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
       |w$k AS MATERIALIZED (SELECT a, b, cnt FROM (
       |  SELECT a, b, count(*) AS cnt FROM p$k GROUP BY a, b
       |  ORDER BY cnt DESC, a, b LIMIT 1)),
       |t$k AS MATERIALIZED (
       |  SELECT doc_id, trim(regexp_replace(
       |    replace(' ' || replace(text, ' ', '  ') || ' ',
       |      ' ' || (SELECT a FROM w$k) || '  ' || (SELECT b FROM w$k) || ' ',
       |      ' ' || (SELECT a FROM w$k) || '+' || (SELECT b FROM w$k) || ' '),
       |    ' +', ' ', 'g')) AS text
       |  FROM $prev)""".stripMargin
  }

  private val oTextBpeTrain =
    s"""WITH ${(1 to 6).map(oBpeRound).mkString(",\n")}
       |${(1 to 6).map(k =>
          s"SELECT $k AS round, a, b, cnt FROM w$k").mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin

  // C83: sentence segmentation. The fixture corpus has NO punctuation
  // (C44's situation again), so the gate INJECTS terminators
  // deterministically on both engines — every 7th token gets '.',
  // every 11th (non-7th) '!' — then segments; docs land at 1..7
  // sentences each with real multi-terminator boundaries, so the
  // split rule, ordinality, and per-sentence token counts are all
  // pinned on non-degenerate decisions.
  def textSentences(s: SparkSession, d: String): DataFrame = {
    val injected = T.documents(s, d).select(col("doc_id"),
      trim(array_join(transform(TextAnalysis.tokens(col("text")),
        (w, i) => concat(w, when((i + 1) % 7 === 0, lit(". "))
          .when((i + 1) % 11 === 0, lit("! ")).otherwise(lit(" ")))),
        "")).as("text"))
    TextAnalysis.segmentSentences(injected).orderBy("doc_id", "sent_idx")
  }

  private val oTextSentences =
    """WITH t AS (
      |  SELECT doc_id, trim(list_aggregate(list_transform(
      |    string_split(text, ' '),
      |    (x, i) -> x || CASE WHEN i % 7 = 0 THEN '. '
      |                        WHEN i % 11 = 0 THEN '! '
      |                        ELSE ' ' END), 'string_agg', '')) AS text
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, list_filter(list_transform(
      |    regexp_extract_all(text, '[^.!?]+[.!?]*'), x -> trim(x)),
      |    x -> x <> '') AS arr
      |  FROM t)
      |SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx, arr[i] AS sentence,
      |  CAST(len(string_split(arr[i], ' ')) AS BIGINT) AS n_tokens
      |FROM s, LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) g
      |ORDER BY doc_id, sent_idx""".stripMargin

  // C102 (r10): HTML/markup stripping — the first transform every
  // web-scraped corpus runs. The fixture corpus is plain text, so
  // the gate WRAPS it in deterministic markup on both engines (the
  // C44 injected-fixture discipline): a real tag skeleton, per-token
  // <br/> on every 4th doc, a comment, and the five named entities —
  // then strips. The md5 pins tag removal, one-level entity decode
  // (&amp;lt; style double-encoding must NOT double-decode — decode
  // order is fixed with &amp; last), and whitespace collapse.
  def textHtmlStrip(s: SparkSession, d: String): DataFrame = {
    val spaced = when(col("doc_id") % 4 === 0,
      replace(col("text"), lit(" "), lit(" <br/> "))).otherwise(col("text"))
    val html = concat(
      lit("<html><head><title>t</title></head><body><p id=\""),
      col("doc_id"), lit("\">"), spaced,
      lit("</p><div>&lt;x&gt; &quot;y&quot; &amp;z &nbsp;w &amp;lt;keep</div>" +
        "<!-- end --></body></html>"))
    T.documents(s, d)
      .select(col("doc_id"), length(html).cast("long").as("len_html"),
        TextAnalysis.stripHtml(html).as("clean"))
      .select(col("doc_id"), col("len_html"),
        length(col("clean")).cast("long").as("len_clean"),
        md5(col("clean")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  private val oTextHtmlStrip =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>t</title></head><body><p id="' || doc_id || '">' ||
      |    CASE WHEN doc_id % 4 = 0 THEN replace(text, ' ', ' <br/> ')
      |         ELSE text END ||
      |    '</p><div>&lt;x&gt; &quot;y&quot; &amp;z &nbsp;w &amp;lt;keep</div>' ||
      |    '<!-- end --></body></html>' AS html
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(length(html) AS BIGINT) AS len_html,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(replace(
      |        regexp_replace(regexp_replace(html, '<!--.*?-->', ' ', 'g'),
      |          '<[^>]*>', ' ', 'g'),
      |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
      |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
      |      '\s+', ' ', 'g')) AS clean
      |  FROM h)
      |SELECT doc_id, len_html, CAST(length(clean) AS BIGINT) AS len_clean,
      |  md5(clean) AS text_md5
      |FROM c ORDER BY doc_id""".stripMargin

  // C103 (r10): encoding-damage (mojibake) screen — the corpus-hygiene
  // check for UTF-8-decoded-as-Latin-1 artifacts ('Ã¡'-class: 'Ã'
  // followed by a continuation-range char) and U+FFFD replacement
  // characters. Clean fixture corpus → the damage is INJECTED
  // deterministically on both engines: every 7th doc gets its 'a's
  // Latin-1-mangled, every 11th gains two replacement chars; overlap
  // docs carry both. Integer counts + ppm rate, map-only at any scale.
  def textMojibake(s: SparkSession, d: String): DataFrame = {
    val t1 = when(col("doc_id") % 7 === 0,
      replace(col("text"), lit("a"), lit("Ã¡"))).otherwise(col("text"))
    val raw = when(col("doc_id") % 11 === 0,
      concat(t1, lit(" �x�"))).otherwise(t1)
    val (latin1, repl) = TextAnalysis.mojibakeStats(raw)
    T.documents(s, d)
      .select(col("doc_id"), length(raw).cast("long").as("n_chars"),
        latin1.cast("long").as("n_latin1"), repl.cast("long").as("n_replacement"))
      .select(col("doc_id"), col("n_chars"), col("n_latin1"), col("n_replacement"),
        (col("n_latin1") + col("n_replacement") > 0).as("is_damaged"),
        expr("(n_latin1 + n_replacement) * 1000000L div greatest(n_chars, 1L)")
          .as("damage_ppm"))
      .orderBy(col("doc_id"))
  }

  private val oTextMojibake =
    """WITH inj AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN t1 || ' �x�' ELSE t1 END AS raw
      |  FROM (
      |    SELECT doc_id,
      |      CASE WHEN doc_id % 7 = 0
      |           THEN replace(text, 'a', chr(195) || chr(161))
      |           ELSE text END AS t1
      |    FROM documents) a),
      |m AS (
      |  SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_chars,
      |    CAST(len(regexp_extract_all(raw,
      |      chr(195) || '[' || chr(128) || '-' || chr(191) || ']')) AS BIGINT)
      |      AS n_latin1,
      |    CAST(len(regexp_extract_all(raw, chr(65533))) AS BIGINT)
      |      AS n_replacement
      |  FROM inj)
      |SELECT doc_id, n_chars, n_latin1, n_replacement,
      |  (n_latin1 + n_replacement) > 0 AS is_damaged,
      |  (n_latin1 + n_replacement) * 1000000 // greatest(n_chars, 1) AS damage_ppm
      |FROM m ORDER BY doc_id""".stripMargin

  // C44: canonical text normalization. The fixture corpus is pure
  // ASCII (NFC would be vacuous), so the gate first INJECTS the mess
  // normalization exists to clean — decomposed accents (a + U+0301) on
  // every 7th doc, uppercasing on every 3rd, whitespace runs on every
  // 5th — identically on both engines, then normalizes. len_raw ≠
  // len_norm on the accented docs proves real NFC composition (the
  // combining pair folds to one code point); the md5 pins casefold
  // and whitespace collapse. A stubbed or ASCII-only normalize breaks
  // the hash.
  def textNormalize(s: SparkSession, d: String): DataFrame = {
    val t1 = when(col("doc_id") % 7 === 0,
      replace(col("text"), lit("a"), lit("a\u0301"))).otherwise(col("text"))
    val t2 = when(col("doc_id") % 3 === 0, upper(t1)).otherwise(t1)
    val raw = when(col("doc_id") % 5 === 0, replace(t2, lit(" "), lit("   "))).otherwise(t2)
    T.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("len_raw"),
        length(TextAnalysis.normalizeText(col("raw"))).cast("long").as("len_norm"),
        md5(TextAnalysis.normalizeText(col("raw"))).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  private val oTextNormalize =
    """WITH inj AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN replace(t2, ' ', '   ') ELSE t2 END AS raw
      |  FROM (
      |    SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN upper(t1) ELSE t1 END AS t2
      |    FROM (
      |      SELECT doc_id,
      |        CASE WHEN doc_id % 7 = 0 THEN replace(text, 'a', 'a' || chr(769))
      |             ELSE text END AS t1
      |      FROM documents) a) b),
      |norm AS (
      |  SELECT doc_id, raw,
      |    trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')) AS n
      |  FROM inj)
      |SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
      |  CAST(length(n) AS BIGINT) AS len_norm, md5(n) AS text_md5
      |FROM norm ORDER BY doc_id""".stripMargin

  // C45: robust (median/MAD) length-outlier trimming per language —
  // kept docs with the group stats as provenance. All comparisons are
  // dyadic-exact (integer n_chars), so the kept SET is engine-exact,
  // not approximately so. k = 2.0 actually trims this corpus (479 of
  // 500 kept at sf0.01) — at the default 3.0 the gate would pass
  // vacuously with nothing dropped.
  def corpusOutliers(s: SparkSession, d: String): DataFrame =
    TextAnalysis.madTrim(T.documents(s, d), col("n_chars"), col("lang"), k = 2.0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("med").cast("double").as("med"), col("mad").cast("double").as("mad"))
      .orderBy(col("doc_id"))

  private val oCorpusOutliers =
    """WITH med AS (
      |  SELECT lang, median(n_chars) AS med FROM documents GROUP BY lang),
      |mad AS (
      |  SELECT d.lang, median(abs(d.n_chars - m.med)) AS mad
      |  FROM documents d JOIN med m USING (lang) GROUP BY d.lang)
      |SELECT d.doc_id, d.lang, d.n_chars,
      |  CAST(m.med AS DOUBLE) AS med, CAST(a.mad AS DOUBLE) AS mad
      |FROM documents d JOIN med m USING (lang) JOIN mad a USING (lang)
      |WHERE abs(d.n_chars - m.med) <= 2.0 * a.mad
      |ORDER BY d.doc_id""".stripMargin

  // C47: per-doc salient terms (integer-exact tf-idf variant) —
  // top-3 tokens per document by tf·10⁹ div df, ties by token.
  def textTfidfTopK(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tfIdfTopK(T.documents(s, d), 3)
      .orderBy(col("doc_id"), col("rn"))

  private val oTextTfidf =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
      |dfq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY tok)
      |SELECT doc_id, CAST(rn AS INT) AS rn, tok, tf, df, score FROM (
      |  SELECT t.doc_id, t.tok, t.tf, d.df,
      |    (t.tf * 1000000000) // d.df AS score,
      |    row_number() OVER (PARTITION BY t.doc_id
      |      ORDER BY (t.tf * 1000000000) // d.df DESC, t.tok) AS rn
      |  FROM tf t JOIN dfq d USING (tok)) x
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // C50 (r8): BM25 top-k retrieval — three term queries over the
  // corpus, scored with the log-free Robertson IDF so every factor is
  // rational and the hash compare exact (Retrieval.bm25TopK doc).
  // Oracle spells out the identical arithmetic with every literal
  // cast to DOUBLE (DuckDB's bare 0.5 is DECIMAL — BIGINT + DECIMAL
  // would diverge from Spark's double path).
  def textBm25(s: SparkSession, d: String): DataFrame =
    Retrieval.bm25TopK(T.documents(s, d), col("doc_id"),
      split(lower(col("text")), " "),
      Seq(("q1", Seq("hash", "join")),
        ("q2", Seq("stream", "window", "merge")),
        ("q3", Seq("vector", "scan"))),
      k = 10)
      .orderBy(col("query"), col("rk"))

  private val oTextBm25 =
    """WITH docs AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      |toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
      |qt(query, term) AS (VALUES
      |  ('q1','hash'),('q1','join'),
      |  ('q2','stream'),('q2','window'),('q2','merge'),
      |  ('q3','vector'),('q3','scan')),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
      |       WHERE term IN ('hash','join','stream','window','merge','vector','scan')
      |       GROUP BY doc_id, term),
      |dfr AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |        FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT q.query, t.doc_id,
      |    CAST(round(
      |      ((CAST(s.n AS DOUBLE) - f.df + CAST(0.5 AS DOUBLE)) /
      |        (f.df + CAST(0.5 AS DOUBLE)))
      |      * (t.tf * CAST(2.2 AS DOUBLE))
      |      / (t.tf + CAST(1.2 AS DOUBLE) *
      |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl /
      |            (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
      |      * CAST(1e9 AS DOUBLE)) AS BIGINT) AS nano
      |  FROM tf t JOIN dfr f USING (term) JOIN qt q USING (term)
      |    JOIN dl d USING (doc_id) CROSS JOIN stats s),
      |scored AS (SELECT query, doc_id, CAST(sum(nano) AS BIGINT) AS score_nano
      |           FROM contrib GROUP BY query, doc_id),
      |ranked AS (SELECT query, doc_id, score_nano,
      |             CAST(row_number() OVER (PARTITION BY query
      |               ORDER BY score_nano DESC, doc_id) AS INT) AS rk
      |           FROM scored)
      |SELECT query, rk, doc_id, score_nano FROM ranked
      |WHERE rk <= 10 ORDER BY query, rk""".stripMargin

  // C109 (r10): NDCG ranking-quality eval — the metric every
  // retrieval stack (C50 BM25, C54 RRF) reports. Graded relevance is
  // a deterministic label (rel = doc_id·7 mod 4; gain = 2^rel − 1),
  // and the log2 discounts — the one genuinely irrational piece —
  // are PRE-SCALED micro-integer literals shared verbatim by both
  // engines (round(1e6/log2(i+1)), i ≤ 10), so DCG/IDCG are exact
  // integer sums and NDCG an integer ppm divide: no float ever
  // crosses the engine boundary (the C78 readability trick). IDCG
  // reranks the RETRIEVED set (permutation quality — answers "did
  // the ranker order what it found correctly"). Cost on top of the
  // ranking: one k-row window per query + two k-row aggs; evaluation
  // state ∝ queries × k, never corpus.
  def evalNdcg(s: SparkSession, d: String): DataFrame = {
    val discCase = "CASE rk WHEN 1 THEN 1000000L WHEN 2 THEN 630930L " +
      "WHEN 3 THEN 500000L WHEN 4 THEN 430677L WHEN 5 THEN 386853L " +
      "WHEN 6 THEN 356207L WHEN 7 THEN 333333L WHEN 8 THEN 315465L " +
      "WHEN 9 THEN 301030L ELSE 289065L END"
    val ranked = Retrieval.bm25TopK(T.documents(s, d), col("doc_id"),
      split(lower(col("text")), " "),
      Seq(("q1", Seq("hash", "join")),
        ("q2", Seq("stream", "window", "merge")),
        ("q3", Seq("vector", "scan"))),
      k = 10)
      .withColumn("gain", expr("CAST(pow(2, (doc_id * 7) % 4) AS BIGINT) - 1L"))
    val wIdeal = Window.partitionBy("query")
      .orderBy(col("gain").desc, col("doc_id"))
    ranked
      .withColumn("dcg_part", expr(s"gain * ($discCase)"))
      .withColumn("irk", row_number().over(wIdeal))
      .withColumn("idcg_part",
        expr(s"gain * (${discCase.replace("CASE rk", "CASE irk")})"))
      .groupBy("query")
      .agg(sum(col("dcg_part")).as("dcg_micro"),
        sum(col("idcg_part")).as("idcg_micro"),
        count(lit(1)).as("k"))
      .withColumn("ndcg_ppm",
        expr("CASE WHEN idcg_micro > 0 THEN dcg_micro * 1000000L div idcg_micro ELSE 0L END"))
      .select("query", "k", "dcg_micro", "idcg_micro", "ndcg_ppm")
      .orderBy("query")
  }

  private val oEvalNdcg = {
    val disc = "CASE %s WHEN 1 THEN 1000000 WHEN 2 THEN 630930 " +
      "WHEN 3 THEN 500000 WHEN 4 THEN 430677 WHEN 5 THEN 386853 " +
      "WHEN 6 THEN 356207 WHEN 7 THEN 333333 WHEN 8 THEN 315465 " +
      "WHEN 9 THEN 301030 ELSE 289065 END"
    val bm25Body = oTextBm25.stripSuffix("ORDER BY query, rk")
      .replaceFirst("(?s)SELECT query, rk, doc_id, score_nano FROM ranked\\s+WHERE rk <= 10\\s*$",
        "SELECT query, rk, doc_id FROM ranked WHERE rk <= 10")
    s"""WITH topk AS ($bm25Body),
       |g AS (
       |  SELECT query, rk, doc_id,
       |    CAST(power(2, (doc_id * 7) % 4) AS BIGINT) - 1 AS gain
       |  FROM topk),
       |ideal AS (
       |  SELECT query, rk, gain,
       |    row_number() OVER (PARTITION BY query
       |      ORDER BY gain DESC, doc_id) AS irk
       |  FROM g),
       |agg AS (
       |  SELECT query, CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(gain * (${disc.format("rk")})) AS BIGINT) AS dcg_micro,
       |    CAST(sum(gain * (${disc.format("irk")})) AS BIGINT) AS idcg_micro
       |  FROM ideal GROUP BY query)
       |SELECT query, k, dcg_micro, idcg_micro,
       |  CASE WHEN idcg_micro > 0
       |    THEN CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT)
       |    ELSE 0 END AS ndcg_ppm
       |FROM agg ORDER BY query""".stripMargin
  }

  // C64 (r9, capped r12): hard-negative mining — the contrastive-
  // training prep pass a retrieval/embedding fine-tune needs: anchor
  // queries are docs themselves (every 17th ≡ 3; query terms = the
  // doc's first 3 tokens), the positive is the source doc, and the
  // hard negatives are the top BM25-ranked OTHER docs — lexically
  // close but not the answer, exactly what contrastive losses want.
  // Data-derived queries exercise the bm25TopKQueries DataFrame path
  // (broadcast semi-join term filter instead of a literal IN). All
  // arithmetic is the C50 nano-rounded rational BM25, so the oracle
  // re-derives the entire chain: anchor sampling, query construction,
  // scoring, positive exclusion, negative re-ranking.
  //
  // The mined batch is CAPPED at 512 anchors (r11 verdict #2): the
  // r9 gate let queries grow ∝ corpus, which multiplied against
  // postings ∝ corpus made the one super-linear production line on
  // the sf1.0 board (×15.7–×23 for ×10 data; bound-based WAND/TA
  // pruning measured useless here — ~0% of queries settle at P ≤ 64
  // because tf≈1 postings make every per-term contrib distribution
  // flat). Mining is a BATCH serving workload — the contract C7
  // declares for ANN ("corpus-sized batches belong elsewhere") holds
  // for lexical mining too, so the gate now enforces it: anchors are
  // a deterministic multiplicative-hash-ordered sample (uniform over
  // the corpus, engine-portable integer arithmetic — (id mod p)·c
  // mod p with p = 1e9+7 keeps every intermediate under 2⁶³), capped
  // at `maxAnchors`. Cost is postings-of-512-queries ∝ corpus —
  // linear. At sf ≤ 0.1 the cap does not bind (≤ 294 anchors), so
  // the result set is the r9 one unchanged.
  def mineHardNegatives(s: SparkSession, d: String): DataFrame =
    mineHardNegativesCapped(s, d, maxAnchors = 512)

  def mineHardNegativesCapped(s: SparkSession, d: String,
      maxAnchors: Int): DataFrame = {
    val docs = T.documents(s, d)
    val toks = split(lower(col("text")), " ")
    val anchors = docs.filter(col("doc_id") % 17 === 3)
      .select(col("doc_id"), slice(toks, 1, 3).as("qtoks"))
      .orderBy(col("doc_id") % 1000000007L * 2654435761L % 1000000007L,
        col("doc_id"))
      .limit(maxAnchors)
    // r15: the anchor batch is ≤ maxAnchors rows but its lineage is a
    // corpus-wide sort-limit; it is broadcast TWICE inside the scorer
    // (term semi-join + query join). Checkpoint the exploded terms once
    // (≤ 3·maxAnchors rows) so the sort-limit runs once, not per
    // broadcast (guide §1.2).
    val qt = anchors
      .select(col("doc_id").as("query"), explode(col("qtoks")).as("term"))
      .localCheckpoint(true)
    val ranked = Retrieval.bm25TopKQueries(docs, col("doc_id"), toks, qt, k = 5,
      spreadCorpus = true, pinPostings = true)
    val negW = Window.partitionBy("query").orderBy(col("rk"))
    ranked.filter(col("doc_id") =!= col("query"))
      .withColumn("neg_rank", row_number().over(negW))
      .filter(col("neg_rank") <= 3)
      .select(col("query").as("qid"), col("neg_rank").cast("int").as("neg_rank"),
        col("doc_id").as("neg_doc_id"), col("score_nano"))
      .orderBy(col("qid"), col("neg_rank"))
  }

  private val oMineHardNegatives =
    """WITH docs AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      |anchors AS (SELECT doc_id, toks[1:3] AS qtoks FROM docs
      |            WHERE doc_id % 17 = 3
      |            ORDER BY doc_id % 1000000007 * 2654435761 % 1000000007,
      |              doc_id
      |            LIMIT 512),
      |qt AS (SELECT doc_id AS query, unnest(qtoks) AS term FROM anchors),
      |toksx AS (SELECT doc_id, unnest(toks) AS term FROM docs),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toksx
      |       WHERE term IN (SELECT DISTINCT term FROM qt)
      |       GROUP BY doc_id, term),
      |dfr AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |        FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT q.query, t.doc_id,
      |    CAST(round(
      |      ((CAST(s.n AS DOUBLE) - f.df + CAST(0.5 AS DOUBLE)) /
      |        (f.df + CAST(0.5 AS DOUBLE)))
      |      * (t.tf * CAST(2.2 AS DOUBLE))
      |      / (t.tf + CAST(1.2 AS DOUBLE) *
      |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl /
      |            (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
      |      * CAST(1e9 AS DOUBLE)) AS BIGINT) AS nano
      |  FROM tf t JOIN dfr f USING (term) JOIN qt q USING (term)
      |    JOIN dl d USING (doc_id) CROSS JOIN stats s),
      |scored AS (SELECT query, doc_id, CAST(sum(nano) AS BIGINT) AS score_nano
      |           FROM contrib GROUP BY query, doc_id),
      |ranked AS (SELECT query, doc_id, score_nano,
      |             row_number() OVER (PARTITION BY query
      |               ORDER BY score_nano DESC, doc_id) AS rk
      |           FROM scored),
      |negs AS (SELECT query, doc_id, score_nano,
      |           CAST(row_number() OVER (PARTITION BY query ORDER BY rk) AS INT)
      |             AS neg_rank
      |         FROM ranked WHERE rk <= 5 AND doc_id != query)
      |SELECT query AS qid, neg_rank, doc_id AS neg_doc_id, score_nano
      |FROM negs WHERE neg_rank <= 3 ORDER BY qid, neg_rank""".stripMargin

  // C54 (r8): hybrid retrieval via reciprocal-rank fusion — the C50
  // BM25 lexical lists and a dense cosine ranking (query vectors =
  // embeddings 0..2, id space shared with doc_id) fused by the
  // integer RRF score 10⁹ div (60 + rank). Both input rankings are
  // engine-exact (BM25's nano-rounded contributions; dense ranks
  // ordered by nano-rounded cosine), and the fusion itself is pure
  // BIGINT — one hash compare covers both retrievers AND the fusion
  // arithmetic. Oracle re-derives all three stages.
  def textRrfFusion(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val emb = T.embeddings(s, d)
    val lex = Retrieval.bm25TopK(docs, col("doc_id"),
      split(lower(col("text")), " "),
      Seq(("q1", Seq("hash", "join")),
        ("q2", Seq("stream", "window", "merge")),
        ("q3", Seq("vector", "scan"))),
      k = 10).select("query", "doc_id", "rk")
    val qvec = emb.filter(col("vec_id") < 3)
      .select(concat(lit("q"), (col("vec_id") + 1).cast("string")).as("query"),
        col("embedding"))
    val dense = Retrieval.denseRanks(qvec, emb, 10)
    Retrieval.rrfFuse(Seq(lex, dense), 10)
      .orderBy(col("query"), col("rk"))
  }

  private val oTextRrfFusion =
    """WITH docs AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      |toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
      |qt(query, term) AS (VALUES
      |  ('q1','hash'),('q1','join'),
      |  ('q2','stream'),('q2','window'),('q2','merge'),
      |  ('q3','vector'),('q3','scan')),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
      |       WHERE term IN ('hash','join','stream','window','merge','vector','scan')
      |       GROUP BY doc_id, term),
      |dfr AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |        FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT q.query, t.doc_id,
      |    CAST(round(
      |      ((CAST(s.n AS DOUBLE) - f.df + CAST(0.5 AS DOUBLE)) /
      |        (f.df + CAST(0.5 AS DOUBLE)))
      |      * (t.tf * CAST(2.2 AS DOUBLE))
      |      / (t.tf + CAST(1.2 AS DOUBLE) *
      |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl /
      |            (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
      |      * CAST(1e9 AS DOUBLE)) AS BIGINT) AS nano
      |  FROM tf t JOIN dfr f USING (term) JOIN qt q USING (term)
      |    JOIN dl d USING (doc_id) CROSS JOIN stats s),
      |lexsc AS (SELECT query, doc_id, CAST(sum(nano) AS BIGINT) AS sn
      |          FROM contrib GROUP BY query, doc_id),
      |lex AS (SELECT query, doc_id, rk FROM (
      |  SELECT query, doc_id,
      |    row_number() OVER (PARTITION BY query ORDER BY sn DESC, doc_id) AS rk
      |  FROM lexsc) x WHERE rk <= 10),
      |qv AS (SELECT 'q' || CAST(vec_id + 1 AS VARCHAR) AS query, embedding
      |       FROM embeddings WHERE vec_id < 3),
      |dense AS (SELECT query, doc_id, rk FROM (
      |  SELECT q.query, c.vec_id AS doc_id,
      |    row_number() OVER (PARTITION BY q.query ORDER BY
      |      CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |        CAST(c.embedding AS DOUBLE[])) * 1e9) AS BIGINT) DESC,
      |      c.vec_id) AS rk
      |  FROM qv q CROSS JOIN embeddings c) t WHERE rk <= 10),
      |u AS (SELECT query, doc_id, 1000000000 // (60 + rk) AS pts FROM lex
      |      UNION ALL
      |      SELECT query, doc_id, 1000000000 // (60 + rk) FROM dense),
      |f AS (SELECT query, doc_id, CAST(sum(pts) AS BIGINT) AS rrf_nano,
      |        CAST(count(*) AS BIGINT) AS n_systems
      |      FROM u GROUP BY query, doc_id)
      |SELECT query, CAST(rk AS INT) AS rk, doc_id, rrf_nano, n_systems FROM (
      |  SELECT query, doc_id, rrf_nano, n_systems,
      |    row_number() OVER (PARTITION BY query
      |      ORDER BY rrf_nano DESC, doc_id) AS rk FROM f) x
      |WHERE rk <= 10 ORDER BY query, rk""".stripMargin

  // C55 (r8): passage-level exact dedup with keep-first rewrite —
  // 5-token segments duplicated across ≥2 docs are dropped everywhere
  // but their lowest-id doc, docs reassembled from the survivors
  // (Dedup.dedupSegments doc). Non-vacuous at sf0.01: the fixture
  // corpus's planted boilerplate yields ~257 duplicated segments /
  // ~577 occurrences. The full cleaned TEXT is exported, so the hash
  // pins segmentation, the keep-first rule, and the reassembly order.
  def textLineDedup(s: SparkSession, d: String): DataFrame =
    Dedup.dedupSegments(T.documents(s, d), segTokens = 5, minDocs = 2)
      .orderBy(col("doc_id"))

  private val oTextLineDedup =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |segs AS (
      |  SELECT doc_id, CAST(i AS INT) AS seg_idx,
      |    array_to_string(toks[(i * 5 + 1):(i * 5 + 5)], ' ') AS seg
      |  FROM t, unnest(range(0, CAST(ceil(len(toks) / 5.0) AS BIGINT))) u(i)),
      |dup AS (SELECT seg, min(doc_id) AS keeper FROM segs
      |        GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
      |marked AS (
      |  SELECT s.doc_id, s.seg_idx, s.seg,
      |    (d.keeper IS NULL OR d.keeper = s.doc_id) AS keep
      |  FROM segs s LEFT JOIN dup d USING (seg))
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_segs,
      |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
      |  CAST(CASE WHEN count(*) FILTER (WHERE keep) = 0 THEN 0
      |    ELSE len(string_split(string_agg(seg, ' ' ORDER BY seg_idx)
      |      FILTER (WHERE keep), ' ')) END AS BIGINT) AS tokens_clean,
      |  coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep), '')
      |    AS text_clean
      |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // C56 (r8): URL parsing + per-domain rollup — the crawl-curation
  // pass that groups documents by registrable host and paths. URLs
  // are BUILT from known columns (the B47/C12 fixture discipline:
  // https://<source>.example.com/<lang>/doc-<id>?ref=<id mod 7>#s<id mod 3>),
  // then torn back apart with Spark's parse_url (HOST/PATH/QUERY
  // with a key/REF) — while the oracle predicts every component
  // directly from the columns and never parses, so a parser bug
  // cannot cancel itself. Per-host rollup counts docs and distinct
  // languages; all per-row scalar work + one hash agg.
  def textUrlParse(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/doc-"), col("doc_id"),
      lit("?ref="), col("doc_id") % 7, lit("#s"), col("doc_id") % 3)
    val parsed = T.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), url.as("url"))
      .select(col("doc_id"), col("source"), col("lang"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"),
        parse_url(col("url"), lit("REF")).as("frag"))
    parsed.groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        countDistinct("path").as("n_paths"),
        sum(col("ref").cast("long")).as("sum_ref"),
        countDistinct("frag").as("n_frags"))
      .orderBy("host")
  }

  private val oTextUrlParse =
    """SELECT source || '.example.com' AS host,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(count(DISTINCT '/' || lang || '/doc-' || doc_id) AS BIGINT)
      |    AS n_paths,
      |  CAST(sum(doc_id % 7) AS BIGINT) AS sum_ref,
      |  CAST(count(DISTINCT 's' || (doc_id % 3)) AS BIGINT) AS n_frags
      |FROM documents GROUP BY source ORDER BY host""".stripMargin

  // C108 (r10): canonical-URL dedup — the crawl-frontier staple: the
  // same page arrives as http/https, with/without www, host case
  // garbled, tracking params appended, trailing slash — URL-level
  // dedup BEFORE any fetch or text compare collapses them. The messy
  // URL is BUILT from known columns (C56 fixture discipline) so the
  // oracle re-derives the canonical form from FIRST PRINCIPLES and
  // never re-runs the string surgery — a broken canonicalizer breaks
  // the hash. Each group of 4 same-source docs (doc_id ≡ mod 20 is
  // the source; div 80 is the page) exercises all four mess forms:
  // clean https / http+utm / WWW+upper-host / http+slash+utm. The
  // chain (parse_url, lower, two anchored regexp_replace) is map-only
  // codegen; the dedup is one hash agg on the canonical string —
  // corpus-linear at any scale.
  def dedupUrl(s: SparkSession, d: String): DataFrame = {
    val v = expr("(doc_id div 20) % 4")
    val page = expr("doc_id div 80")
    val url = concat(
      when(v === 0 || v === 2, lit("https")).otherwise(lit("http")),
      lit("://"),
      when(v === 2, concat(lit("WWW."), upper(col("source"))))
        .otherwise(col("source")),
      lit(".Example.COM/p/"), page,
      when(v === 3, lit("/")).otherwise(lit("")),
      lit("?id="), page,
      when(v === 1 || v === 3,
        concat(lit("&utm_source=feed&utm_campaign=c"), col("doc_id") % 9))
        .otherwise(lit("")))
    T.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        regexp_replace(lower(parse_url(col("url"), lit("HOST"))),
          "^www\\.", "").as("host"),
        regexp_replace(parse_url(col("url"), lit("PATH")), "/$", "").as("path"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("id"))
      .select(col("doc_id"),
        concat(lit("https://"), col("host"), col("path"),
          lit("?id="), col("id")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"))
      .orderBy("keep_id")
  }

  private val oDedupUrl =
    """SELECT 'https://' || source || '.example.com/p/' || (doc_id // 80)
      |    || '?id=' || (doc_id // 80) AS canonical_url,
      |  min(doc_id) AS keep_id, count(*) AS n_variants
      |FROM documents
      |GROUP BY 1 ORDER BY keep_id""".stripMargin

  // C57 (r8): domain-blocklist filtering — the UT1-style URL screen
  // every crawl pipeline runs before any text processing: a host is
  // blocked when it EQUALS a listed domain or is a subdomain of one
  // (dot-boundary suffix — "le.com" must NOT catch "example.com").
  // The config-sized list compiles to ONE codegen'd OR-chain on the
  // scan (no join, no shuffle, no regex); a megarule list would swap
  // to a broadcast join on the registrable-domain suffix — declared,
  // same semantics. First matching rule exported for provenance.
  // Hosts are the C56 constructed URLs, so the oracle re-derives the
  // decision from the source column and never does suffix matching.
  def textDomainFilter(s: SparkSession, d: String): DataFrame = {
    // "ample.com" pins the dot boundary: every host ENDS WITH
    // "ample.com" as a bare suffix, and none is a subdomain of it —
    // a naive endsWith would block the whole corpus
    val rules = Seq("src3.example.com", "ample.com", "src17.example.com")
    val host = concat(col("source"), lit(".example.com"))
    val rule = rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(host === r || host.endsWith("." + r), lit(r)).otherwise(acc)
    }
    T.documents(s, d)
      .select(col("doc_id"), col("source"), host.as("host"), rule.as("blocked_by"))
      .withColumn("kept", col("blocked_by").isNull)
      .orderBy("doc_id")
  }

  private val oTextDomainFilter =
    """SELECT doc_id, source, source || '.example.com' AS host,
      |  CASE WHEN source = 'src3' THEN 'src3.example.com'
      |       WHEN source = 'src17' THEN 'src17.example.com' END AS blocked_by,
      |  (source NOT IN ('src3', 'src17')) AS kept
      |FROM documents ORDER BY doc_id""".stripMargin

  // C58 (r8): end-to-end epoch manifest — the full dataloader
  // contract in one gate: seeded md5 permutation → key-routed shard
  // deal → per-shard (shuffle_key, doc_id) packing into 256-token
  // bins (Packing.epochManifest doc). EVERY row of the manifest is
  // exported (position, bin, offset), so the hash pins the
  // permutation, the shard deal, and the prefix-sum packing at once.
  def packEpochManifest(s: SparkSession, d: String): DataFrame =
    Packing.epochManifest(T.documents(s, d), col("doc_id"),
      size(split(col("text"), " ")).cast("long"),
      seed = "ep1", budget = 256L, shards = 4)
      .orderBy("shard", "pos_in_shard")

  private val oPackEpochManifest =
    """WITH keyed AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    md5('ep1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |  FROM documents),
      |sharded AS (
      |  SELECT *, CAST(((instr('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1) * 16
      |    + instr('0123456789abcdef', substr(shuffle_key, 2, 1)) - 1) % 4 AS BIGINT)
      |    AS shard
      |  FROM keyed),
      |pos AS (
      |  SELECT doc_id, shard, tokens,
      |    CAST(row_number() OVER w AS BIGINT) AS pos_in_shard,
      |    CAST(sum(tokens) OVER (PARTITION BY shard
      |      ORDER BY shuffle_key, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM sharded WINDOW w AS (PARTITION BY shard ORDER BY shuffle_key, doc_id))
      |SELECT doc_id, shard, pos_in_shard, tokens,
      |  (cum - tokens) // 256 AS bin,
      |  (cum - tokens) - ((cum - tokens) // 256) * 256 AS offset_in_bin
      |FROM pos ORDER BY shard, pos_in_shard""".stripMargin

  // C60 (r8): the full curation loop as ONE gated query — passage
  // dedup (C55) → integer quality logit on the CLEANED text (C53's
  // arithmetic) → quality-prioritized token-budget selection (C35,
  // logit bucketized to the low-cardinality prio its histogram path
  // requires) → epoch manifest (C58) over the kept set. Every stage
  // is individually gated; this pins their COMPOSITION — schema
  // hand-offs, the cleaned-token recount feeding the budget, the
  // budget feeding the shard deal — under one hash. The oracle
  // re-derives the entire chain in a single CTE pipeline.
  def corpusPipelineE2e(s: SparkSession, d: String): DataFrame = {
    val cleaned = Dedup.dedupSegments(T.documents(s, d), segTokens = 5, minDocs = 2)
      .filter(col("tokens_clean") > 0)
      .select(col("doc_id"), col("text_clean").as("text"), col("tokens_clean"))
    // divisors guarded with greatest(…, 1): the tokens_clean > 0
    // filter removes every 0-token row, but Catalyst may collapse the
    // projection past it and (under ANSI) evaluate the division on
    // rows it is about to drop — the guard never changes a surviving
    // row (n_tokens ≥ 1 there)
    val scored = TextAnalysis.qualityMetrics(cleaned, col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div greatest(n_tokens, 1)"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div greatest(n_chars_m, 1)"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("logit_micro",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .filter(col("logit_micro") > 0L)
      .withColumn("prio", expr("logit_micro div 100000L"))
    // r15 (guide §1.2 — don't recompute what you already paid for):
    // the dedup+quality pipeline fed THREE separate evaluations — the
    // two require() counts and the returned manifest plan. Checkpoint
    // the doc-sized scored projection once; the counts and the final
    // manifest all read the materialized rows. Values unchanged.
    val scoredSlim = scored.select(col("doc_id"), col("prio"), col("tokens_clean"))
      .localCheckpoint(true)
    val kept = Packing.selectTokenBudget(
      scoredSlim,
      "prio", "tokens_clean", "doc_id", budget = 8000L)
    val (nScored, nKept) = (scoredSlim.count(), kept.count())
    require(nKept > 0 && nKept < nScored,
      s"budget must bind mid-corpus: kept $nKept of $nScored")
    Packing.epochManifest(kept, col("doc_id"), col("tokens_clean"),
      seed = "e2e", budget = 256L, shards = 4)
      .orderBy("shard", "pos_in_shard")
  }

  private def oCorpusPipelineE2e =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |segs AS (
       |  SELECT doc_id, CAST(i AS INT) AS seg_idx,
       |    array_to_string(toks[(i * 5 + 1):(i * 5 + 5)], ' ') AS seg
       |  FROM t, unnest(range(0, CAST(ceil(len(toks) / 5.0) AS BIGINT))) u(i)),
       |dup AS (SELECT seg, min(doc_id) AS keeper FROM segs
       |        GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
       |marked AS (
       |  SELECT s.doc_id, s.seg_idx, s.seg,
       |    (d.keeper IS NULL OR d.keeper = s.doc_id) AS keep
       |  FROM segs s LEFT JOIN dup d USING (seg)),
       |cleaned AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens_clean
       |  FROM (SELECT doc_id,
       |          coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
       |            FILTER (WHERE keep), '') AS text
       |        FROM marked GROUP BY doc_id) c
       |  WHERE text <> ''),
       |scored0 AS (
       |  SELECT doc_id, tokens_clean,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |        x -> list_contains(${stopListSql("en")}, x))) AS BIGINT)
       |      * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |    CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |      * 1000000 // length(text) AS punct_ppm,
       |    CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |  FROM cleaned),
       |scored AS (
       |  SELECT doc_id, tokens_clean,
       |    (-140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3) // 100000 AS prio
       |  FROM scored0
       |  WHERE -140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3 > 0),
       |kept AS (
       |  SELECT doc_id, tokens_clean FROM (
       |    SELECT doc_id, tokens_clean,
       |      sum(tokens_clean) OVER (ORDER BY prio DESC, doc_id
       |        ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM scored) b
       |  WHERE cum <= 8000),
       |keyed AS (
       |  SELECT doc_id, tokens_clean AS tokens,
       |    md5('e2e:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
       |  FROM kept),
       |sharded AS (
       |  SELECT *, CAST(((instr('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1) * 16
       |    + instr('0123456789abcdef', substr(shuffle_key, 2, 1)) - 1) % 4 AS BIGINT)
       |    AS shard
       |  FROM keyed),
       |pos AS (
       |  SELECT doc_id, shard, tokens,
       |    CAST(row_number() OVER w AS BIGINT) AS pos_in_shard,
       |    CAST(sum(tokens) OVER (PARTITION BY shard
       |      ORDER BY shuffle_key, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM sharded WINDOW w AS (PARTITION BY shard ORDER BY shuffle_key, doc_id))
       |SELECT doc_id, shard, pos_in_shard, tokens,
       |  (cum - tokens) // 256 AS bin,
       |  (cum - tokens) - ((cum - tokens) // 256) * 256 AS offset_in_bin
       |FROM pos ORDER BY shard, pos_in_shard""".stripMargin

  // C61 (r8): SFT pair formatting — the supervised-fine-tuning prep
  // pass that turns documents into chat-templated (instruction,
  // response) training rows: instruction = first 12 tokens, response
  // = the rest capped at 48 (token-boundary truncation, the C14c
  // slice idiom), rendered through a fixed chat template; docs too
  // short to yield a response drop out (486 of 500 survive at sf0.01
  // — non-vacuous both ways). Pure per-row map work on one scan — no shuffle at
  // any corpus size; the md5 of every rendered string is exported so
  // the hash pins slicing, truncation, AND the template bytes.
  def sftFormat(s: SparkSession, d: String): DataFrame = {
    val out = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 12)
      .select(col("doc_id"),
        expr("array_join(slice(toks, 1, 12), ' ')").as("instr"),
        expr("array_join(slice(toks, 13, 48), ' ')").as("resp"),
        (col("n") - 12 > 48).as("truncated"),
        least(col("n") - 12, lit(48)).cast("long").as("n_resp_toks"))
      .select(col("doc_id"), col("truncated"), col("n_resp_toks"),
        md5(concat(lit("<|user|>\n"), col("instr"),
          lit("\n<|assistant|>\n"), col("resp"), lit("<|end|>"))).as("pair_md5"))
      .orderBy("doc_id")
    out
  }

  private val oSftFormat =
    """SELECT doc_id,
      |  (len(toks) - 12 > 48) AS truncated,
      |  CAST(least(len(toks) - 12, 48) AS BIGINT) AS n_resp_toks,
      |  md5('<|user|>' || chr(10) || array_to_string(toks[1:12], ' ')
      |    || chr(10) || '<|assistant|>' || chr(10)
      |    || array_to_string(toks[13:60], ' ') || '<|end|>') AS pair_md5
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
      |WHERE len(toks) > 12 ORDER BY doc_id""".stripMargin

  // C85: SFT loss-mask offsets — what the training loader actually
  // consumes next to C61's rendered pair: the exact CHARACTER span of
  // the response inside the rendered template (prompt-loss masking),
  // token counts per side, and the mask fraction in ppm. The gate is
  // SELF-VERIFYING: `offsets_valid` re-slices the rendered string at
  // the claimed offsets and compares to the response — a drifted
  // template length or an off-by-one makes the exported boolean (and
  // the oracle's identical re-derivation) flip. Pure per-row codegen
  // arithmetic over lengths; zero shuffle.
  def sftLossMask(s: SparkSession, d: String): DataFrame = {
    val base = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 12)
      .select(col("doc_id"),
        expr("array_join(slice(toks, 1, 12), ' ')").as("instr"),
        expr("array_join(slice(toks, 13, 48), ' ')").as("resp"))
    val prompt = concat(lit("<|user|>\n"), col("instr"),
      lit("\n<|assistant|>\n"))
    val rendered = concat(prompt, col("resp"), lit("<|end|>"))
    base.select(col("doc_id"),
        length(prompt).cast("long").as("resp_start"),
        length(col("resp")).cast("long").as("resp_len"),
        length(rendered).cast("long").as("total_len"),
        expr("CAST(length(resp) AS BIGINT) * 1000000L").as("_num"),
        rendered.as("_r"), col("resp").as("_resp"))
      .select(col("doc_id"), col("resp_start"), col("resp_len"),
        col("total_len"),
        expr("_num DIV total_len").as("mask_ppm"),
        (expr("substring(_r, CAST(resp_start + 1 AS INT), CAST(resp_len AS INT))")
          === col("_resp")).as("offsets_valid"),
        md5(col("_r")).as("rendered_md5"))
      .orderBy("doc_id")
  }

  private val oSftLossMask =
    """WITH base AS (
      |  SELECT doc_id,
      |    array_to_string(toks[1:12], ' ') AS instr,
      |    array_to_string(toks[13:60], ' ') AS resp
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
      |  WHERE len(toks) > 12),
      |r AS (
      |  SELECT doc_id,
      |    '<|user|>' || chr(10) || instr || chr(10) || '<|assistant|>'
      |      || chr(10) AS prompt,
      |    resp
      |  FROM base),
      |m AS (
      |  SELECT doc_id, resp,
      |    CAST(length(prompt) AS BIGINT) AS resp_start,
      |    CAST(length(resp) AS BIGINT) AS resp_len,
      |    prompt || resp || '<|end|>' AS rendered
      |  FROM r)
      |SELECT doc_id, resp_start, resp_len,
      |  CAST(length(rendered) AS BIGINT) AS total_len,
      |  resp_len * 1000000 // length(rendered) AS mask_ppm,
      |  substr(rendered, (resp_start + 1)::INT, resp_len::INT) = resp
      |    AS offsets_valid,
      |  md5(rendered) AS rendered_md5
      |FROM m ORDER BY doc_id""".stripMargin

  // C86: k-anonymity audit — the privacy readout next to C17/C80's
  // redaction: a document is re-identifiable not through explicit
  // PII but through QUASI-IDENTIFIER combinations (language × source
  // × length band here — the classic Sweeney result). k = how many
  // corpus docs share a doc's QI tuple; k below threshold flags a
  // release risk. ONE window count over the QI partition (a single
  // shuffle keyed by the tuple, no join) — the same shape at any
  // corpus size; the threshold verdict is a codegen'd comparison.
  def privacyKAnon(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang", "source", "len_band")
    T.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars DIV 100").as("len_band"))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("doc_id"), col("lang"), col("source"), col("len_band"),
        col("k"), (col("k") < 5).as("risky"))
      .orderBy("doc_id")
  }

  private val oPrivacyKAnon =
    """SELECT doc_id, lang, source, n_chars // 100 AS len_band,
      |  CAST(count(*) OVER (PARTITION BY lang, source, n_chars // 100)
      |    AS BIGINT) AS k,
      |  count(*) OVER (PARTITION BY lang, source, n_chars // 100) < 5
      |    AS risky
      |FROM documents ORDER BY doc_id""".stripMargin

  // C110 (r10): l-diversity audit — k-anonymity's (C86) necessary
  // companion: a group can be k-large yet leak everything if all its
  // members share ONE sensitive value (the homogeneity attack
  // k-anonymity cannot see). Quasi-identifiers = (nation, segment) on
  // customers; sensitive = the account-balance band; per QI group the
  // export carries k, l = |distinct sensitive values|, and both
  // verdicts — exactly the table a release review reads. One hash agg
  // with a distinct-count, group-sized output at any corpus size.
  def privacyLDiversity(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 2000) AS BIGINT)").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("k"),
        countDistinct(col("bal_band")).as("l"),
        min(col("bal_band")).as("min_band"),
        max(col("bal_band")).as("max_band"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment"), col("k"), col("l"),
        (col("k") >= 5).as("k_anonymous"), (col("l") >= 3).as("l_diverse"),
        col("min_band"), col("max_band"))
      .orderBy("nationkey", "c_mktsegment")

  private val oPrivacyLDiversity =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS k,
      |  CAST(count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
      |    AS BIGINT) AS l,
      |  count(*) >= 5 AS k_anonymous,
      |  count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) >= 3
      |    AS l_diverse,
      |  min(CAST(floor(c_acctbal / 2000) AS BIGINT)) AS min_band,
      |  max(CAST(floor(c_acctbal / 2000) AS BIGINT)) AS max_band
      |FROM customer
      |GROUP BY 1, 2 ORDER BY nationkey, c_mktsegment""".stripMargin

  // C115 (r10): t-closeness audit — the third privacy lens after
  // k-anonymity (C86) and l-diversity (C110): a group can be k-large
  // AND l-diverse yet still leak by DISTRIBUTION (all its balances in
  // the top bands). t-closeness bounds the Earth-Mover's Distance
  // between each group's sensitive distribution and the global one;
  // over ORDERED equal-width bands EMD has the exact closed form
  // Σᵢ|cum_p(i) − cum_q(i)| / (m−1), which integerizes on the common
  // denominator k·N: |cum_cnt·N − cum_gcnt·k| per band, summed and
  // ppm-scaled — no float, engine-exact. Shape: a (groups × bands)
  // grid (both config-sized) with broadcast global shares; the only
  // window walks one group's ≤m bands.
  def privacyTCloseness(s: SparkSession, d: String): DataFrame = {
    val cust = T.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal / 2000) AS BIGINT)").as("band"))
    val groups = cust.groupBy("nationkey", "seg").agg(count(lit(1)).as("k"))
    val gband = cust.groupBy("band").agg(count(lit(1)).as("gcnt"))
    val total = cust.agg(count(lit(1)).as("n_total"),
      countDistinct(col("band")).as("m"))
    val cnts = cust.groupBy("nationkey", "seg", "band")
      .agg(count(lit(1)).as("cnt"))
    val grid = groups.crossJoin(broadcast(gband))
      .join(cnts, Seq("nationkey", "seg", "band"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(total))
    val wCum = Window.partitionBy("nationkey", "seg").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_cnt", sum(col("cnt")).over(wCum))
      .withColumn("cum_gcnt", sum(col("gcnt")).over(wCum))
      .withColumn("num", abs(col("cum_cnt") * col("n_total") -
        col("cum_gcnt") * col("k")))
      .groupBy("nationkey", "seg")
      .agg(max(col("k")).as("k"),
        expr("sum(num) * 1000000L div (max(k) * max(n_total) * (max(m) - 1L))")
          .as("t_ppm"))
      .withColumn("t_close", col("t_ppm") <= 200000L)
      .orderBy("nationkey", "seg")
  }

  private val oPrivacyTCloseness =
    """WITH cust AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |    c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS band
      |  FROM customer),
      |groups AS (SELECT nationkey, seg, CAST(count(*) AS BIGINT) AS k
      |           FROM cust GROUP BY 1, 2),
      |gband AS (SELECT band, CAST(count(*) AS BIGINT) AS gcnt
      |          FROM cust GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
      |               CAST(count(DISTINCT band) AS BIGINT) AS m FROM cust),
      |cnts AS (SELECT nationkey, seg, band, CAST(count(*) AS BIGINT) AS cnt
      |         FROM cust GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT g.nationkey, g.seg, g.k, b.band, b.gcnt,
      |    coalesce(c.cnt, 0) AS cnt, t.n_total, t.m
      |  FROM groups g CROSS JOIN gband b
      |  LEFT JOIN cnts c ON c.nationkey = g.nationkey AND c.seg = g.seg
      |    AND c.band = b.band
      |  CROSS JOIN tot t),
      |cum AS (
      |  SELECT nationkey, seg, k, n_total, m,
      |    abs(sum(cnt) OVER (PARTITION BY nationkey, seg ORDER BY band
      |          ROWS UNBOUNDED PRECEDING) * n_total -
      |        sum(gcnt) OVER (PARTITION BY nationkey, seg ORDER BY band
      |          ROWS UNBOUNDED PRECEDING) * k) AS num
      |  FROM grid)
      |SELECT nationkey, seg, max(k) AS k,
      |  CAST(sum(num) * 1000000 // (max(k) * max(n_total) * (max(m) - 1))
      |    AS BIGINT) AS t_ppm,
      |  CAST(sum(num) * 1000000 // (max(k) * max(n_total) * (max(m) - 1))
      |    AS BIGINT) <= 200000 AS t_close
      |FROM cum GROUP BY 1, 2 ORDER BY nationkey, seg""".stripMargin

  // C111 (r10): connected components over the host graph — the
  // crawl-curation grouping signal PageRank (C75) and BFS (C79) do
  // not give: which hosts form one linked cluster (mirror families,
  // link farms — per-component caps are a standard curation rule).
  // Same deterministic fixture edges as C75; Graphs.connectedComponents
  // runs FIXED-round min-label propagation (one shuffle per round,
  // state ∝ nodes, localCheckpoint-cut lineage — the shape that holds
  // at a billion hosts), and the gate exports per-component size AND
  // the last-round change count, so convergence is part of the
  // hashed contract, not an assumption. The oracle replays the exact
  // k rounds as chained CTEs.
  def graphComponents(s: SparkSession, d: String): DataFrame = {
    val e0 = T.documents(s, d)
      .select(col("source").as("src"),
        concat(lit("src"), (col("doc_id") * 7 + 3) % 20).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    Graphs.connectedComponents(e0, iters = 6)
      .groupBy(col("label").as("root"))
      .agg(count(lit(1)).as("n_hosts"),
        sum(when(col("label") =!= col("prev_label"), 1L).otherwise(0L))
          .as("n_changed_last_round"),
        min(col("node")).as("first_host"),
        max(col("node")).as("last_host"))
      .orderBy("root")
  }

  private val oGraphComponents = {
    def round(k: Int): String =
      s"""l$k AS MATERIALIZED (
         |  SELECT c.node, least(c.label, coalesce(nb.nl, c.label)) AS label
         |  FROM l${k - 1} c LEFT JOIN (
         |    SELECT u.b AS node, min(c2.label) AS nl
         |    FROM und u JOIN l${k - 1} c2 ON u.a = c2.node GROUP BY u.b) nb
         |  USING (node))""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT source AS src,
       |    'src' || ((doc_id * 7 + 3) % 20) AS dst
       |  FROM documents WHERE source <> 'src' || ((doc_id * 7 + 3) % 20)),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT src AS a, dst AS b FROM e0
       |    UNION ALL SELECT dst AS a, src AS b FROM e0)),
       |l0 AS MATERIALIZED (
       |  SELECT node, node AS label FROM (SELECT DISTINCT a AS node FROM und)),
       |${(1 to 6).map(round).mkString(",\n")}
       |SELECT l6.label AS root, CAST(count(*) AS BIGINT) AS n_hosts,
       |  CAST(sum(CASE WHEN l6.label <> l5.label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_changed_last_round,
       |  min(l6.node) AS first_host, max(l6.node) AS last_host
       |FROM l6 JOIN l5 ON l6.node = l5.node
       |GROUP BY 1 ORDER BY root""".stripMargin
  }

  // C121 (r11): label-propagation communities (LPA) — community
  // structure where C111's components are too coarse (one giant
  // component) and modularity solvers too heavy; deterministic
  // variant (count DESC, label ASC ties — classic LPA ties randomly,
  // which no cross-engine gate could pin), FIXED 4 rounds, per-node
  // label + last-round stability exported. Same synthetic host graph
  // as graph_components; the oracle unrolls the 4 synchronous rounds
  // as MATERIALIZED CTEs with a windowed argmax per round.
  def graphCommunities(s: SparkSession, d: String): DataFrame = {
    val e0 = T.documents(s, d)
      .select(col("source").as("src"),
        concat(lit("src"), (col("doc_id") * 7 + 3) % 20).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    Graphs.labelPropagation(e0, iters = 4)
      .select(col("node"), col("label"),
        (col("label") === col("prev_label")).as("stable"))
      .orderBy("node")
  }

  private val oGraphCommunities = {
    def round(k: Int): String =
      s"""l$k AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT u.b AS node, c.label,
         |      row_number() OVER (PARTITION BY u.b
         |        ORDER BY count(*) DESC, c.label) AS rn
         |    FROM und u JOIN l${k - 1} c ON u.a = c.node
         |    GROUP BY u.b, c.label) WHERE rn = 1)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT source AS src,
       |    'src' || ((doc_id * 7 + 3) % 20) AS dst
       |  FROM documents WHERE source <> 'src' || ((doc_id * 7 + 3) % 20)),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT src AS a, dst AS b FROM e0
       |    UNION ALL SELECT dst AS a, src AS b FROM e0)),
       |l0 AS MATERIALIZED (
       |  SELECT node, node AS label FROM (SELECT DISTINCT a AS node FROM und)),
       |${(1 to 4).map(round).mkString(",\n")}
       |SELECT l4.node AS node, l4.label, l4.label = l3.label AS stable
       |FROM l4 JOIN l3 ON l4.node = l3.node
       |ORDER BY l4.node""".stripMargin
  }

  // C59 (r8): corpus distribution drift — the "did the new crawl
  // shift the token distribution" report run before swapping a
  // training corpus: token shares (integer ppm) in corpus A (sources
  // 0-9) vs corpus B (sources 10-19), top movers by absolute ppm
  // delta. One explode → per-(token, side) hash agg (output ∝ vocab),
  // a 2-row total agg broadcast back, the only sort the vocab-sized
  // top-k window. All-integer arithmetic: cnt·10⁶ div side_total, so
  // the exported deltas and the top-50 cut are engine-exact.
  def corpusDrift(s: SparkSession, d: String): DataFrame = {
    val side = when(substring(col("source"), 4, 10).cast("int") < 10, "a")
      .otherwise("b")
    val toks = T.documents(s, d)
      .select(side.as("side"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy("side", "tok").agg(count(lit(1)).as("cnt"))
    val totals = toks.groupBy("side").agg(count(lit(1)).as("total"))
    val ppm = counts.join(broadcast(totals), "side")
      .select(col("tok"), col("side"),
        expr("cnt * 1000000L div total").as("ppm"), col("cnt"))
    val wide = ppm.groupBy("tok")
      .agg(coalesce(max(when(col("side") === "a", col("ppm"))), lit(0L)).as("ppm_a"),
        coalesce(max(when(col("side") === "a", col("cnt"))), lit(0L)).as("cnt_a"),
        coalesce(max(when(col("side") === "b", col("ppm"))), lit(0L)).as("ppm_b"),
        coalesce(max(when(col("side") === "b", col("cnt"))), lit(0L)).as("cnt_b"))
      .withColumn("delta_ppm", col("ppm_a") - col("ppm_b"))
    // top-50 movers via orderBy+limit (distributed TakeOrdered), so
    // the rank window runs over 50 rows — never the vocab-sized
    // relation in one task (r12 eager-audit sweep)
    val w = Window.orderBy(abs(col("delta_ppm")).desc, col("tok"))
    wide.orderBy(abs(col("delta_ppm")).desc, col("tok")).limit(50)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("rk", "tok", "cnt_a", "ppm_a", "cnt_b", "ppm_b", "delta_ppm")
      .orderBy("rk")
  }

  private val oCorpusDrift =
    """WITH toks AS (
      |  SELECT CASE WHEN CAST(substr(source, 4, 10) AS INT) < 10
      |    THEN 'a' ELSE 'b' END AS side,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |counts AS (SELECT side, tok, CAST(count(*) AS BIGINT) AS cnt
      |           FROM toks GROUP BY side, tok),
      |totals AS (SELECT side, CAST(count(*) AS BIGINT) AS total
      |           FROM toks GROUP BY side),
      |ppm AS (SELECT tok, side, cnt, cnt * 1000000 // total AS ppm
      |        FROM counts JOIN totals USING (side)),
      |wide AS (
      |  SELECT tok,
      |    CAST(coalesce(max(CASE WHEN side = 'a' THEN ppm END), 0) AS BIGINT) AS ppm_a,
      |    CAST(coalesce(max(CASE WHEN side = 'a' THEN cnt END), 0) AS BIGINT) AS cnt_a,
      |    CAST(coalesce(max(CASE WHEN side = 'b' THEN ppm END), 0) AS BIGINT) AS ppm_b,
      |    CAST(coalesce(max(CASE WHEN side = 'b' THEN cnt END), 0) AS BIGINT) AS cnt_b
      |  FROM ppm GROUP BY tok),
      |ranked AS (
      |  SELECT tok, cnt_a, ppm_a, cnt_b, ppm_b, ppm_a - ppm_b AS delta_ppm,
      |    CAST(row_number() OVER (ORDER BY abs(ppm_a - ppm_b) DESC, tok) AS BIGINT)
      |      AS rk
      |  FROM wide)
      |SELECT rk, tok, cnt_a, ppm_a, cnt_b, ppm_b, delta_ppm
      |FROM ranked WHERE rk <= 50 ORDER BY rk""".stripMargin

  // C51 (r8): n-gram diversity per source — type-token ratio and
  // distinct-bigram ratio, the cheap corpus-health signals that
  // catch template/boilerplate sources (low diversity) before
  // training. One explode → hash agg per measure (map-side combine;
  // distinct via the two-level agg Spark plans for countDistinct);
  // everything integer-exact except the two round(,6) ratios.
  def corpusNgramDiversity(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val base = T.documents(s, d).select(col("source"), toks.as("toks"))
    val unigrams = base.select(col("source"), explode(col("toks")).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("tokens"), countDistinct(col("g")).as("types"))
    val bigrams = base.select(col("source"), explode(
        expr("transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("bigrams"), countDistinct(col("g")).as("bigram_types"))
    unigrams.join(bigrams, "source")
      .select(col("source"), col("tokens"), col("types"),
        round(col("types") / col("tokens").cast("double"), 6).as("ttr"),
        col("bigrams"), col("bigram_types"),
        round(col("bigram_types") / col("bigrams").cast("double"), 6)
          .as("bigram_ttr"))
      .orderBy(col("source"))
  }

  private val oCorpusNgramDiversity =
    """WITH docs AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
      |uni AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS tokens,
      |         CAST(count(DISTINCT g) AS BIGINT) AS types
      |  FROM (SELECT source, unnest(toks) AS g FROM docs) t GROUP BY source),
      |bi AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS bigrams,
      |         CAST(count(DISTINCT g) AS BIGINT) AS bigram_types
      |  FROM (SELECT source, unnest(list_transform(range(1, len(toks)),
      |          i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))) AS g
      |        FROM docs) t GROUP BY source)
      |SELECT source, tokens, types,
      |  round(types / CAST(tokens AS DOUBLE), 6) AS ttr,
      |  bigrams, bigram_types,
      |  round(bigram_types / CAST(bigrams AS DOUBLE), 6) AS bigram_ttr
      |FROM uni JOIN bi USING (source) ORDER BY source""".stripMargin

  // C52 (r8, refit r12): curriculum phase assignment — order the
  // corpus by an integer quality key (stopword density in
  // parts-per-million: integer-exact, total order with the doc_id
  // tie-break) and cut it into 4 training phases, highest quality
  // first. The r8 form ran ntile(4) over an UNPARTITIONED window — a
  // single-task stage ∝ corpus that the r12 eager-plan audit flagged
  // (the C119 defect class); now the global rank comes from the C74
  // partition-wise prefix (Prefix.globalRank) and the exact ntile cut
  // is a map-side expression on that rank — same phases, hash-equal,
  // no single-task stage.
  def corpusCurriculum(s: SparkSession, d: String): DataFrame = {
    val m = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("qkey",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
    val (ranked, total) = Prefix.globalRank(m, "__rn",
      Seq(col("qkey").desc, col("doc_id")))
    ranked.withColumn("phase",
        Prefix.ntileFromRank("__rn", 4, total).cast("int"))
      .select(col("doc_id"), col("qkey"), col("phase"))
      .orderBy(col("doc_id"))
  }

  private def oCurriculum =
    s"""SELECT doc_id, qkey,
       |  CAST(ntile(4) OVER (ORDER BY qkey DESC, doc_id) AS INT) AS phase
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |        t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |      * 1000000 // len(string_split(text, ' ')) AS qkey
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // C53 (r8): linear quality classifier in integer fixed-point — the
  // fastText/CCNet-style "keep for pretraining?" filter as a scored
  // decision, not just a rule cascade (C31): features in ppm
  // (stopword density, punctuation density) and a capped length
  // term, fixed integer weights, micro-scaled logit, threshold at 0.
  // The sigmoid is monotone so the DECISION never needs it — the
  // whole classifier stays in BIGINT arithmetic and the gate is
  // hash-exact (a float sigmoid would differ in ulps across
  // engines). One codegen'd map pass; weights chosen to actually
  // split this corpus (require-asserted non-vacuous).
  def corpusQualityClassifier(s: SparkSession, d: String): DataFrame = {
    val m = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("logit_micro",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .withColumn("keep", col("logit_micro") > 0L)
    val split = m.groupBy("keep").count().collect()
    require(split.length == 2,
      s"classifier must split the corpus: ${split.mkString(",")}")
    m.select("doc_id", "stop_ppm", "punct_ppm", "logit_micro", "keep")
      .orderBy(col("doc_id"))
  }

  private def oQualityClassifier =
    s"""SELECT doc_id, stop_ppm, punct_ppm,
       |  -140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3 AS logit_micro,
       |  (-140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3) > 0 AS keep
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |        t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |      * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |    CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |      * 1000000 // length(text) AS punct_ppm,
       |    CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // C11: rolling-hash fingerprint.
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val oTextFingerprint =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text) + 1),
      |        i -> CAST(ascii(substr(text, i::INT, 1)) AS BIGINT))),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // C65 (r9): hashing-trick feature vectorization — the fixed-width
  // sparse featurizer a quality classifier (C53) trains on when the
  // vocabulary is unbounded: feature index = portable rolling hash of
  // the token (C11's polynomial, exact in both engines — no
  // Spark-seeded hash leaks into the contract) mod 512, value = count.
  // One explode + one hash agg per corpus — shuffle ∝ (doc, bucket)
  // pairs, the same shape at any scale; downstream consumers get a
  // stable integer feature space with the standard hashing-trick
  // collision trade.
  def textHashedFeatures(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .select(col("doc_id"),
        pmod(TextAnalysis.fingerprint(col("term")), lit(512L)).as("feature_idx"))
      .groupBy("doc_id", "feature_idx").agg(count(lit(1)).as("n"))
      .orderBy(col("doc_id"), col("feature_idx"))

  private val oTextHashedFeatures =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |           FROM documents WHERE doc_id % 3 = 0),
      |h AS (SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(term) + 1),
      |        i -> CAST(ascii(substr(term, i::INT, 1)) AS BIGINT))),
      |    (a, c) -> (a * 31 + c) % 1000000007) % 512 AS feature_idx
      |  FROM t)
      |SELECT doc_id, feature_idx, count(*) AS n
      |FROM h GROUP BY doc_id, feature_idx
      |ORDER BY doc_id, feature_idx""".stripMargin

  // C76 (r9): hashed n-gram importance scoring — the DSIR-family
  // data-selection signal ("Data Selection for Language Models via
  // Importance Resampling", Xie et al. 2023): score every raw doc by
  // how much its hashed-bigram profile looks like the TARGET
  // distribution (here: the English subcorpus) versus the raw corpus
  // overall, then keep/weight by the score. The published method uses
  // log-likelihood ratios of hashed n-gram models; this is the
  // integer-exact variant — per-bucket weight = ppm_target −
  // ppm_raw (truncating DIV, no transcendental in the contract), doc
  // score = Σ over its bigram occurrences of the bucket weight.
  // Scale shape: one explode ∝ corpus tokens → doc×bucket hash agg
  // (the C65 shape), ONE 1024-row bucket table with both counts (a
  // single conditional-agg pass — no second corpus scan), totals by
  // declared 1-row broadcast crossJoin, weights broadcast back onto
  // the doc×bucket pairs. Docs under 2 tokens have no bigrams and are
  // excluded by construction (declared).
  def textImportance(s: SparkSession, d: String): DataFrame =
    textImportanceOn(T.documents(s, d))

  /** C76 core over any (doc_id, lang, text) frame — also driven by
    * the StressBench 1M-doc probe.
    */
  def textImportanceOn(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val db = docs
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
        .as("bg"))
      .select(col("doc_id"), col("lang"),
        pmod(TextAnalysis.fingerprint(col("bg")), lit(1024L)).as("bkt"))
      .groupBy("doc_id", "lang", "bkt").agg(count(lit(1)).as("c"))
    val buckets = db.groupBy("bkt").agg(
      sum("c").as("n_r"),
      sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("n_t"))
    val totals = buckets.agg(sum("n_r").as("tot_r"), sum("n_t").as("tot_t"))
    val weights = buckets.crossJoin(broadcast(totals))
      .select(col("bkt"),
        (expr("n_t * 1000000L DIV tot_t") - expr("n_r * 1000000L DIV tot_r"))
          .as("w"))
    db.join(broadcast(weights), "bkt")
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), sum(col("c") * col("w")).as("score"))
      .withColumn("kept", col("score") > 0L)
      .orderBy("doc_id")
  }

  private val oTextImportance =
    """WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
      |      AS bg
      |  FROM toks),
      |db AS (
      |  SELECT doc_id, lang,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(bg) + 1),
      |          i -> CAST(ascii(substr(bg, i::INT, 1)) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1000000007) % 1024 AS bkt,
      |    count(*) AS c
      |  FROM bg GROUP BY 1, 2, 3),
      |buckets AS (
      |  SELECT bkt, CAST(sum(c) AS BIGINT) AS n_r,
      |    CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) AS n_t
      |  FROM db GROUP BY bkt),
      |tot AS (SELECT CAST(sum(n_r) AS BIGINT) AS tot_r,
      |               CAST(sum(n_t) AS BIGINT) AS tot_t FROM buckets),
      |w AS (SELECT bkt, n_t * 1000000 // tot_t - n_r * 1000000 // tot_r AS w
      |      FROM buckets CROSS JOIN tot)
      |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
      |  CAST(sum(db.c * w.w) AS BIGINT) AS score,
      |  CAST(sum(db.c * w.w) AS BIGINT) > 0 AS kept
      |FROM db JOIN w USING (bkt)
      |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin

  // C66 (r9): int8 scalar quantization of the embedding column — the
  // 4× compression pass a vector store applies before ANN serving.
  // Codes are exact integers (floor of identical IEEE doubles in both
  // engines), the reconstruction error a strict left fold in index
  // order, so every export hash-matches: the md5 over the code string
  // pins all 64 codes of every vector.
  def embedQuantizeInt8(s: SparkSession, d: String): DataFrame =
    Similarity.quantizeInt8(T.embeddings(s, d), col("embedding"))
      .select(col("vec_id"),
        size(col("codes")).cast("long").as("n_dims"),
        round(col("vmin"), 6).as("vmin_r"),
        round(col("vmax"), 6).as("vmax_r"),
        expr("aggregate(codes, 0L, (a, c) -> a + c)").as("code_sum"),
        array_max(col("codes")).as("code_max"),
        md5(array_join(transform(col("codes"), _.cast("string")), ","))
          .as("codes_md5"),
        round(col("abs_err_sum"), 6).as("err_r"))
      .orderBy(col("vec_id"))

  private val oEmbedQuantizeInt8 =
    """WITH m AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |b AS (SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM m),
      |c AS (
      |  SELECT vec_id, v, vmin, vmax,
      |    CASE WHEN vmax = vmin
      |      THEN list_transform(v, x -> CAST(0 AS BIGINT))
      |      ELSE list_transform(v, x ->
      |        CAST(floor((x - vmin) * 255.0 / (vmax - vmin) + 0.5) AS BIGINT))
      |    END AS codes
      |  FROM b)
      |SELECT vec_id,
      |  CAST(len(codes) AS BIGINT) AS n_dims,
      |  round(vmin, 6) AS vmin_r,
      |  round(vmax, 6) AS vmax_r,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |  list_max(codes) AS code_max,
      |  md5(array_to_string(codes, ',')) AS codes_md5,
      |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(1, len(v) + 1),
      |      i -> abs(v[i] - (vmin + codes[i] * (vmax - vmin) / 255.0)))),
      |    (a, e) -> a + e), 6) AS err_r
      |FROM c ORDER BY vec_id""".stripMargin

  // C67 (r9): length-bucketed batching — shard, sort by length within
  // the shard, cut into 32-doc batches; per-batch pad-waste report.
  // All-integer outputs; the only sort is per-shard.
  def packLengthBatches(s: SparkSession, d: String): DataFrame =
    Packing.lengthBucketedBatches(T.documents(s, d),
        size(TextAnalysis.tokens(col("text"))).cast("long"), 32, 4)
      .orderBy(col("shard"), col("batch"))

  private val oPackLengthBatches =
    """WITH t AS (
      |  SELECT doc_id, doc_id % 4 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |r AS (
      |  SELECT shard, tokens,
      |    (row_number() OVER (PARTITION BY shard ORDER BY tokens, doc_id) - 1)
      |      // 32 AS batch
      |  FROM t)
      |SELECT shard, CAST(batch AS BIGINT) AS batch,
      |  count(*) AS n_docs, min(tokens) AS min_toks, max(tokens) AS max_toks,
      |  CAST(sum(tokens) AS BIGINT) AS sum_toks,
      |  count(*) * max(tokens) - CAST(sum(tokens) AS BIGINT) AS pad_waste
      |FROM r GROUP BY shard, batch ORDER BY shard, batch""".stripMargin

  // C69 (r9): DPO preference-pair construction — the
  // quality-classifier-ranked (chosen, rejected) pair prep a
  // preference-tuning run consumes: per prompt bucket (source), chosen
  // = the highest C53 integer logit, rejected = the lowest (doc_id
  // tie-break), kept only when the margin is strictly positive. The
  // rendered-template md5 pins both texts and the template bytes; the
  // margin stays in exact BIGINT micro units. Scale shape: one metrics
  // scan + two rank-1 windows per bucket — no joins beyond the
  // bucket-keyed pair-up, shuffle ∝ corpus.
  def dpoPairs(s: SparkSession, d: String): DataFrame = {
    val scored = TextAnalysis.qualityMetrics(T.documents(s, d), col("text"))
      .withColumn("stop_ppm",
        expr("cast(stop_n as bigint) * 1000000 div n_tokens"))
      .withColumn("punct_ppm",
        expr("cast(punct_n as bigint) * 1000000 div n_chars_m"))
      .withColumn("len_c", least(col("n_tokens"), lit(500)).cast("long"))
      .withColumn("logit_micro",
        lit(-140000L) + col("len_c") * lit(400L) +
          col("stop_ppm") * lit(2L) - col("punct_ppm") * lit(3L))
      .select("source", "doc_id", "text", "logit_micro")
    val wBest = Window.partitionBy(col("source"))
      .orderBy(col("logit_micro").desc, col("doc_id"))
    val wWorst = Window.partitionBy(col("source"))
      .orderBy(col("logit_micro").asc, col("doc_id"))
    val chosen = scored.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("source"), col("doc_id").as("chosen_id"),
        col("text").as("chosen_text"), col("logit_micro").as("chosen_logit"))
    val rejected = scored.withColumn("rn", row_number().over(wWorst))
      .filter(col("rn") === 1)
      .select(col("source"), col("doc_id").as("rejected_id"),
        col("text").as("rejected_text"), col("logit_micro").as("rejected_logit"))
    chosen.join(rejected, "source")
      .filter(col("chosen_logit") > col("rejected_logit"))
      .select(col("source"), col("chosen_id"), col("rejected_id"),
        (col("chosen_logit") - col("rejected_logit")).as("margin_micro"),
        md5(concat(lit("<|prompt|>"), col("source"),
          lit("\n<|chosen|>\n"), col("chosen_text"),
          lit("\n<|rejected|>\n"), col("rejected_text"))).as("pair_md5"))
      .orderBy(col("source"))
  }

  private def oDpoPairs =
    s"""WITH scored AS (
       |  SELECT source, doc_id, text,
       |    -140000 + len_c * 400 + stop_ppm * 2 - punct_ppm * 3 AS logit
       |  FROM (
       |    SELECT source, doc_id, text,
       |      CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains(${stopListSql("en")}, t))) AS BIGINT)
       |        * 1000000 // len(string_split(text, ' ')) AS stop_ppm,
       |      CAST(len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS BIGINT)
       |        * 1000000 // length(text) AS punct_ppm,
       |      CAST(least(len(string_split(text, ' ')), 500) AS BIGINT) AS len_c
       |    FROM documents) t),
       |rk AS (
       |  SELECT source, doc_id, text, logit,
       |    row_number() OVER (PARTITION BY source ORDER BY logit DESC, doc_id) AS rb,
       |    row_number() OVER (PARTITION BY source ORDER BY logit ASC, doc_id) AS rw
       |  FROM scored),
       |ch AS (SELECT source, doc_id AS chosen_id, text AS ct, logit AS cl
       |       FROM rk WHERE rb = 1),
       |rj AS (SELECT source, doc_id AS rejected_id, text AS rt, logit AS rl
       |       FROM rk WHERE rw = 1)
       |SELECT source, chosen_id, rejected_id, cl - rl AS margin_micro,
       |  md5('<|prompt|>' || source || chr(10) || '<|chosen|>' || chr(10) || ct
       |    || chr(10) || '<|rejected|>' || chr(10) || rt) AS pair_md5
       |FROM ch JOIN rj USING (source) WHERE cl > rl
       |ORDER BY source""".stripMargin

  // C68 (r9): tokenizer fertility per language — the "how many
  // subword tokens does this tokenizer spend per word / per char on
  // each language" report a multilingual data mix is balanced with
  // (fertility imbalance silently re-weights the mix in token space).
  // One scan, |langs|-row hash agg, integer-ppm ratios — engine-exact.
  def textFertility(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("ws"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("chars")).as("n_chars"))
      .withColumn("fertility_ppm",
        expr("bpe_tokens * 1000000L div ws_tokens"))
      .withColumn("chars_per_bpe_ppm",
        expr("n_chars * 1000000L div bpe_tokens"))
      .orderBy(col("lang"))

  private def oTextFertility =
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       |  CAST(sum(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}'))) AS BIGINT) AS bpe_tokens,
       |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
       |  CAST(sum(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}'))) AS BIGINT)
       |    * 1000000 // CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS fertility_ppm,
       |  CAST(sum(length(text)) AS BIGINT) * 1000000
       |    // CAST(sum(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}'))) AS BIGINT) AS chars_per_bpe_ppm
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // C70 (r9): temperature-scaled mixture sampling — α = 1/2 over the
  // language mix. The rate is sqrt(n_min/n_g) (IEEE sqrt: correctly
  // rounded, so floor(rate·1e6) is the same BIGINT on any engine —
  // the reason the exponent surface is dyadic, not pow()), the keep
  // decision the shared ppm bucket. Oracle re-derives counts, rates,
  // and every keep decision.
  def sampleTemperatureQ(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).select(col("doc_id"), col("lang"))
    Packing.sampleTemperature(docs, col("lang"), col("doc_id"), quarters = 2)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        first(col("n_group")).as("n_total"),
        first(col("rate_ppm")).as("rate_ppm"))
      .orderBy(col("lang"))
  }

  private val oSampleTemperature =
    """WITH c AS (SELECT lang, count(*) AS n_group FROM documents GROUP BY 1),
      |m AS (SELECT min(n_group) AS n_min FROM c),
      |r AS (SELECT lang, n_group,
      |        CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_group) * 1000000.0)
      |          AS BIGINT) AS rate_ppm
      |      FROM c, m)
      |SELECT d.lang AS lang, count(*) AS n_sampled,
      |  max(r.n_group) AS n_total, max(r.rate_ppm) AS rate_ppm
      |FROM documents d JOIN r ON d.lang = r.lang
      |WHERE ((d.doc_id % 1000000007) * 554862419) % 1000000007 % 1000000
      |        < r.rate_ppm
      |GROUP BY 1 ORDER BY d.lang""".stripMargin

  // C71 (r9): token-budget corpus selection — keep the best docs
  // (score = capped chars/10) until 50k whitespace tokens are spent.
  // The Spark side runs the scale-correct two-level cut (bucket agg →
  // tiny cumulative window → boundary bucket only resolved per-doc);
  // the oracle runs the plain global running-sum definition — their
  // EQUALITY is the point (the two-level rewrite provably computes
  // the textbook semantics). Per-bucket integer sums + an md5 over
  // the kept ids pin membership exactly.
  def selectTokenBudgetQ(s: SparkSession, d: String): DataFrame =
    Packing.selectByTokenBudget(T.documents(s, d), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long"),
        expr("least(n_chars div 10, 500L)"),
        budget = 50000L, bucketWidth = 10)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("tokens")).as("toks_kept"),
        md5(array_join(array_sort(collect_list(col("doc_id").cast("string"))), ","))
          .as("ids_md5"))
      .orderBy(col("b"))

  private val oSelectTokenBudget =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    least(n_chars // 10, 500) AS score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, tokens, score, score // 10 AS b,
      |    sum(tokens) OVER (ORDER BY score DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM t)
      |SELECT b, count(*) AS n_kept, CAST(sum(tokens) AS BIGINT) AS toks_kept,
      |  md5(string_agg(CAST(doc_id AS VARCHAR), ','
      |    ORDER BY CAST(doc_id AS VARCHAR))) AS ids_md5
      |FROM r WHERE run <= 50000
      |GROUP BY b ORDER BY b""".stripMargin

  // C73 (r9, refit r12): stride-scheduled mixture interleave over the
  // language mix. Exports the first 100 schedule slots
  // (order-sensitive: pos is part of the row) plus per-language
  // counts within three prefix windows — the balance the interleave
  // exists to provide. Integer stride keys + md5 per-source order:
  // the oracle re-derives the ENTIRE schedule. The global slot
  // position was an unpartitioned row_number window (single-task,
  // ∝ corpus — r12 eager-audit finding); it is now the C74
  // partition-wise prefix over the same (stride_key, source, k)
  // total order.
  def mixtureInterleaveQ(s: SparkSession, d: String): DataFrame = {
    val sched0 = Packing.mixtureInterleave(T.documents(s, d),
      col("lang"), col("doc_id"))
    val sched = Prefix.globalRank(sched0, "pos",
      Seq(col("stride_key"), col("source"), col("k")))._1
    val head = sched.filter(col("pos") <= 100)
      .select(lit("slot").as("kind"), col("pos"),
        col("source"), col("doc_id"))
    val prefixes = sched
      .select(explode(array(lit(100L), lit(500L), lit(2000L))).as("win"),
        col("pos"), col("source"))
      .filter(col("pos") <= col("win"))
      .groupBy(col("win"), col("source"))
      .agg(count(lit(1)).as("n_in_prefix"))
      .select(lit("prefix").as("kind"), col("win").as("pos"),
        col("source"), col("n_in_prefix").as("doc_id"))
    head.unionByName(prefixes).orderBy(col("kind"), col("pos"), col("source"))
  }

  private val oMixtureInterleave =
    """WITH base AS (
      |  SELECT lang AS source, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '#ilv'), doc_id) - 1 AS k,
      |    count(*) OVER (PARTITION BY lang) AS w
      |  FROM documents),
      |sched AS (
      |  SELECT source, doc_id, k,
      |    (2*k + 1) * 1000000000000 // (2 * w) AS stride_key
      |  FROM base),
      |pos AS (
      |  SELECT source, doc_id,
      |    CAST(row_number() OVER (ORDER BY stride_key, source, k) AS BIGINT)
      |      AS pos
      |  FROM sched),
      |head AS (
      |  SELECT 'slot' AS kind, pos, source, doc_id FROM pos WHERE pos <= 100),
      |pref AS (
      |  SELECT 'prefix' AS kind, CAST(w.win AS BIGINT) AS pos, p.source,
      |    count(*) AS doc_id
      |  FROM pos p, (VALUES (100), (500), (2000)) AS w(win)
      |  WHERE p.pos <= w.win GROUP BY 1, 2, 3)
      |SELECT kind, pos, source, doc_id FROM head
      |UNION ALL SELECT kind, pos, source, doc_id FROM pref
      |ORDER BY kind, pos, source""".stripMargin

  // C70∘C73 composition (r9): the rebalanced interleaved epoch a
  // loader actually consumes — temperature-sample the language mix
  // (α=1/2), then stride-interleave the KEPT set so every training
  // window holds the rebalanced proportions. The oracle re-derives
  // the whole chain (counts → sqrt rates → ppm keeps → per-source
  // md5 order → integer stride keys → global schedule), so one hash
  // covers the composition's every joint.
  def epochMixInterleave(s: SparkSession, d: String): DataFrame = {
    val kept = Packing.sampleTemperature(
      T.documents(s, d).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), quarters = 2)
    val sched = Prefix.globalRank(
      Packing.mixtureInterleave(kept, col("lang"), col("doc_id")), "pos",
      Seq(col("stride_key"), col("source"), col("k")))._1
    val head = sched.filter(col("pos") <= 50)
      .select(lit("slot").as("kind"), col("pos"), col("source"), col("doc_id"))
    val prefix = sched.filter(col("pos") <= 500)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_in_500"), max(col("w")).as("w"))
      .select(lit("prefix").as("kind"), col("n_in_500").as("pos"),
        col("source"), col("w").as("doc_id"))
    head.unionByName(prefix).orderBy(col("kind"), col("pos"), col("source"))
  }

  private val oEpochMixInterleave =
    """WITH c AS (SELECT lang, count(*) AS n_group FROM documents GROUP BY 1),
      |m AS (SELECT min(n_group) AS n_min FROM c),
      |r AS (SELECT lang, CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_group)
      |        * 1000000.0) AS BIGINT) AS rate_ppm FROM c, m),
      |kept AS (
      |  SELECT d.lang AS source, d.doc_id FROM documents d JOIN r ON d.lang = r.lang
      |  WHERE ((d.doc_id % 1000000007) * 554862419) % 1000000007 % 1000000
      |          < r.rate_ppm),
      |base AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '#ilv'), doc_id) - 1 AS k,
      |    count(*) OVER (PARTITION BY source) AS w
      |  FROM kept),
      |pos AS (
      |  SELECT source, doc_id, w,
      |    CAST(row_number() OVER (ORDER BY
      |      (2*k + 1) * 1000000000000 // (2 * w), source, k) AS BIGINT) AS pos
      |  FROM base),
      |head AS (SELECT 'slot' AS kind, pos, source, doc_id
      |         FROM pos WHERE pos <= 50),
      |pref AS (SELECT 'prefix' AS kind, count(*) AS pos, source,
      |           max(w) AS doc_id
      |         FROM pos WHERE pos <= 500 GROUP BY source)
      |SELECT kind, pos, source, doc_id FROM head
      |UNION ALL SELECT kind, pos, source, doc_id FROM pref
      |ORDER BY kind, pos, source""".stripMargin

  // C74 (r9): dense global positions via the two-pass prefix-offset
  // form — pos is a pure function of the TOTAL order (partitioning
  // only changes how it's computed), so the oracle checks it with the
  // textbook row_number the implementation deliberately avoids. The
  // whole 2000-doc assignment hash-matches, not just a sample.
  def epochPositions(s: SparkSession, d: String): DataFrame =
    Packing.materializePositions(
      T.documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit("#ep9"))).as("ek")),
      Seq(col("ek"), col("doc_id")), partitions = 8)
      .select(col("doc_id"), col("pos"))
      .orderBy(col("pos"))

  private val oEpochPositions =
    """SELECT doc_id,
      |  CAST(row_number() OVER (
      |    ORDER BY md5(CAST(doc_id AS VARCHAR) || '#ep9'), doc_id) - 1
      |    AS BIGINT) AS pos
      |FROM documents ORDER BY pos""".stripMargin

  // C72 (r9): sliding-window chunking — 64-token chunks, stride 48
  // (25% overlap). The md5 over every chunk's text pins the exact
  // window boundaries and the short final window; integer counts pin
  // the coverage arithmetic.
  def textChunk(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chunkDocs(T.documents(s, d), col("doc_id"), col("text"), 64, 48)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_chunk_toks"), col("n_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val oTextChunk =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, toks, n,
      |    greatest(0, CAST(ceil((n - 64) / 48.0) AS BIGINT) * 48) AS last_start
      |  FROM t),
      |c AS (
      |  SELECT doc_id, n AS n_tokens,
      |    CAST(g.start_tok AS BIGINT) AS start_tok,
      |    CAST(g.start_tok / 48 AS BIGINT) AS chunk_idx,
      |    array_to_string(list_slice(toks, g.start_tok + 1, g.start_tok + 64), ' ')
      |      AS chunk_text
      |  FROM s, LATERAL (SELECT unnest(generate_series(0, last_start, 48))
      |                   AS start_tok) g)
      |SELECT doc_id, chunk_idx, start_tok,
      |  least(64, n_tokens - start_tok) AS n_chunk_toks, n_tokens,
      |  md5(chunk_text) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // C14: token-budget sequence packing — whitespace tokens, 512-token
  // sequences, 8 shards. All-integer outputs, exact oracle.
  def packSequences(s: SparkSession, d: String): DataFrame =
    Packing.packSequences(T.documents(s, d),
        size(TextAnalysis.tokens(col("text"))).cast("bigint"), 512L, 8)
      .orderBy(col("doc_id"))

  private val oPackSequences =
    """SELECT doc_id, shard, tokens,
      |  (cum - tokens) // 512 AS seq_in_shard,
      |  (cum - tokens) - ((cum - tokens) // 512) * 512 AS offset_in_seq
      |FROM (
      |  SELECT doc_id, doc_id % 8 AS shard, tokens,
      |    CAST(sum(tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |        FROM documents) t) c
      |ORDER BY doc_id""".stripMargin

  // C14b: packed-sequence text assembly — the step after packing:
  // each (shard, seq) bin's documents concatenated in doc_id order
  // with a separator. collect_list is order-nondeterministic, so the
  // struct array is sorted before joining; export md5 + counts.
  def packTexts(s: SparkSession, d: String): DataFrame = {
    val packed = Packing.packSequences(T.documents(s, d),
      size(TextAnalysis.tokens(col("text"))).cast("bigint"), 512L, 8)
    packed.join(T.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
      .groupBy(col("shard"), col("seq_in_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("seq_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          r => r.getField("text")), "\n")).as("seq_md5"))
      .orderBy(col("shard"), col("seq_in_shard"))
  }

  private val oPackTexts =
    """WITH packed AS (
      |  SELECT doc_id, shard, tokens,
      |    (cum - tokens) // 512 AS seq_in_shard
      |  FROM (
      |    SELECT doc_id, doc_id % 8 AS shard, tokens,
      |      CAST(sum(tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |    FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |          FROM documents) t) c)
      |SELECT p.shard, p.seq_in_shard, count(*) AS n_docs,
      |  CAST(sum(p.tokens) AS BIGINT) AS seq_tokens,
      |  md5(string_agg(d.text, chr(10) ORDER BY p.doc_id)) AS seq_md5
      |FROM packed p JOIN documents d ON p.doc_id = d.doc_id
      |GROUP BY 1, 2 ORDER BY shard, seq_in_shard""".stripMargin

  // C21: boilerplate-token pruning — tokens in ≥80% of docs are
  // corpus boilerplate; strip them and export the kept-token count +
  // md5 of the cleaned text. The oracle recomputes the common set
  // and the filtered join, so both the DF aggregation and the
  // removal expression are hash-gated. (This synthetic corpus has a
  // ~31-token vocabulary, so lower thresholds would swallow whole
  // documents — the operator takes the fraction as a parameter.)
  def textBoilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val common = Vocab.commonTokens(docs, col("text"), 0.8)
    val cleaned = Vocab.removeTokens(col("text"), common)
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(cleaned)).as("n_kept"),
        md5(cleaned).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  private val oTextBoilerplate =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |  FROM documents),
      |common AS (
      |  SELECT t FROM tok GROUP BY t
      |  HAVING count(*) >= 0.8 * (SELECT count(*) FROM documents)),
      |cl AS (SELECT coalesce(list(t), []) AS cs FROM common)
      |SELECT doc_id,
      |  len(list_filter(string_split(text, ' '),
      |      x -> NOT list_contains(cs, x))) AS n_kept,
      |  md5(array_to_string(list_filter(string_split(text, ' '),
      |      x -> NOT list_contains(cs, x)), ' ')) AS kept_md5
      |FROM documents CROSS JOIN cl ORDER BY doc_id""".stripMargin

  // C17: PII scrubbing — each doc gets deterministic synthetic PII
  // appended (so the gate is non-vacuous on a clean corpus), then the
  // redaction chain runs; output is the md5 of the redacted text.
  def textScrub(s: SparkSession, d: String): DataFrame = {
    val pii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example-site.org at 10.1."),
      (col("doc_id") % 250).cast("string"), lit(".7 or +1 (555) 010-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    T.documents(s, d)
      .select(col("doc_id"), md5(Scrub.redact(pii)).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  private val oTextScrub =
    s"""SELECT doc_id, md5(regexp_replace(regexp_replace(regexp_replace(
       |    text || ' contact user' || doc_id || '@example-site.org at 10.1.'
       |         || (doc_id % 250) || '.7 or +1 (555) 010-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
       |    '${Scrub.EmailPattern}', '<EMAIL>', 'g'),
       |    '${Scrub.Ipv4Pattern}', '<IP>', 'g'),
       |    '${Scrub.PhonePattern}', '<PHONE>', 'g')) AS scrub_md5
       |FROM documents ORDER BY doc_id""".stripMargin

  // C18: deterministic train/val/test split — overflow-free mod-prime
  // bucket, stable under corpus growth, identical arithmetic in SQL.
  def splitAssign(s: SparkSession, d: String): DataFrame =
    Packing.splitAssign(T.documents(s, d), col("doc_id"))
      .select(col("doc_id"), col("split_bucket"), col("split"))
      .orderBy(col("doc_id"))

  private val oSplitAssign =
    """SELECT doc_id, b AS split_bucket,
      |  CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |        ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin

  // C34: deterministic epoch shuffle — seeded md5 order (the one hash
  // both engines compute bit-identically), exported as the first 100
  // docs of the epoch plus each one's position. The limit runs FIRST
  // (TakeOrderedAndProject — a distributed top-k, no single-task
  // global window); positions within the top-100 equal the global
  // positions by construction, and exporting them makes the gate
  // order-sensitive even though the driver sorts rows before hashing.
  def shuffleDeterministicQ(s: SparkSession, d: String): DataFrame = {
    val top = Packing.shuffleDeterministic(T.documents(s, d), col("doc_id"), "epoch42")
      .select("doc_id", "shuffle_key")
      .limit(100)
    top.select(col("doc_id"), col("shuffle_key"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("shuffle_key"), col("doc_id"))).as("pos"))
      .orderBy(col("pos"))
  }

  private val oShuffleDeterministic =
    """SELECT doc_id, shuffle_key, pos FROM (
      |  SELECT doc_id, md5('epoch42:' || doc_id) AS shuffle_key,
      |    row_number() OVER (ORDER BY md5('epoch42:' || doc_id), doc_id) AS pos
      |  FROM documents) t
      |ORDER BY pos LIMIT 100""".stripMargin

  // C20: stratified downsampling — keep 10% of 'en' docs and 50% of
  // every other language, deterministically by the shared permille
  // bucket. Exports per-language totals + sampled counts.
  def sampleStratifiedQ(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
    val sampled = Packing.sampleStratified(docs, col("lang"), col("doc_id"),
      Map("en" -> 100), defaultPermille = 500)
    docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
      .join(sampled.groupBy("lang").agg(count(lit(1)).as("n_sampled")), Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  private val oSampleStratified =
    s"""WITH lang AS ($oTextLangidBody),
       |b AS (SELECT doc_id, lang_pred AS lang,
       |        ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
       |      FROM lang)
       |SELECT lang, count(*) AS n_total,
       |  count(*) FILTER (b < CASE WHEN lang = 'en' THEN 100 ELSE 500 END) AS n_sampled
       |FROM b GROUP BY 1 ORDER BY lang""".stripMargin

  // C63 (r9): cluster-balanced sampling — the embedding-space twin of
  // C20's metadata strata: quantize the corpus onto a fixed-size
  // centroid table (the C16 training-free quantizer — broadcastable
  // at any corpus size), then cap each cluster's contribution with a
  // seeded deterministic order. This is the topic-diversity sampler a
  // pretraining mix runs when metadata strata don't exist: without
  // it, the dominant embedding cluster floods the sample. Scale
  // shape: one broadcast cross of corpus × 16 centroids (never
  // corpus × corpus), one window per cluster; sample size ∝
  // clusters · cap. Assignment, seeded order, and per-cluster caps
  // are all exact SQL — the oracle re-derives everything.
  def sampleClusterBalanced(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("emb_c"))
    val assigned = e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cent))
      .withColumn("cos", Similarity.cosine(col("embedding"), col("emb_c")))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("cid"))
    val seeded = Window.partitionBy("cid")
      .orderBy(md5(concat(col("vec_id").cast("string"), lit("#42"))), col("vec_id"))
    assigned
      .withColumn("pick", row_number().over(seeded))
      .withColumn("n_cluster", count(lit(1)).over(Window.partitionBy("cid")))
      .filter(col("pick") <= 5)
      .select(col("cid"), col("pick"), col("vec_id"), col("n_cluster"))
      .orderBy(col("cid"), col("pick"))
  }

  private val oSampleClusterBalanced =
    """WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
      |              WHERE vec_id < 16),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                               CAST(c.embedding AS DOUBLE[])) DESC,
      |        c.cid) AS r
      |    FROM embeddings e CROSS JOIN cent c) t WHERE r = 1),
      |sized AS (
      |  SELECT vec_id, cid,
      |    CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_cluster,
      |    CAST(row_number() OVER (PARTITION BY cid
      |      ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42'), vec_id) AS INT) AS pick
      |  FROM assign)
      |SELECT cid, pick, vec_id, n_cluster FROM sized
      |WHERE pick <= 5 ORDER BY cid, pick""".stripMargin

  // C14c: long-document chunk splitting — the pre-pass packSequences
  // declares as the caller's job. Pure per-row map work (explode over
  // chunk indices + token slicing), chunk identity (doc_id,
  // chunk_idx) deterministic on any engine. Split at 20 tokens so the
  // synthetic ~50-token docs produce real multi-chunk output.
  def packChunksQ(s: SparkSession, d: String): DataFrame =
    Packing.splitLongDocs(
        T.documents(s, d).select(col("doc_id"), col("text")), "text", "doc_id", 20)
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        md5(col("text")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val oPackChunks =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |x AS (SELECT doc_id, toks,
      |        unnest(range(0, greatest(1,
      |          CAST(ceil(len(toks) / 20.0) AS BIGINT)))) AS chunk_idx
      |      FROM t),
      |c AS (SELECT doc_id, chunk_idx,
      |        array_to_string(list_slice(toks, chunk_idx*20 + 1, chunk_idx*20 + 20), ' ')
      |          AS chunk
      |      FROM x)
      |SELECT doc_id, chunk_idx,
      |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
      |  md5(chunk) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // C41: overlapping-window chunking — window 20, stride 10 (50%
  // overlap); md5 of every window hash-gated, so slicing arithmetic,
  // chunk counts, and the short-tail window are all pinned.
  def packChunksSlidingQ(s: SparkSession, d: String): DataFrame =
    Packing.slidingChunks(
        T.documents(s, d).select(col("doc_id"), col("text")), "text", "doc_id", 20, 10)
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        md5(col("text")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val oPackChunksSliding =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |x AS (SELECT doc_id, toks,
      |        unnest(range(0, greatest(0,
      |          CAST(ceil((len(toks) - 20) / 10.0) AS BIGINT)) + 1)) AS chunk_idx
      |      FROM t),
      |c AS (SELECT doc_id, chunk_idx,
      |        array_to_string(list_slice(toks, chunk_idx*10 + 1, chunk_idx*10 + 20), ' ')
      |          AS chunk
      |      FROM x)
      |SELECT doc_id, chunk_idx,
      |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
      |  md5(chunk) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // C35: quality-prioritized token-budget selection — keep the docs
  // with the highest integer English-stopword density (permille,
  // integer-division exact) until the inclusive running token sum
  // hits 10 000. The oracle states the contract directly as ONE
  // global window cumsum; the Spark side proves the scalable
  // histogram + boundary-bucket decomposition computes the same set.
  def sampleTokenBudgetQ(s: SparkSession, d: String): DataFrame = {
    val stopEn = graft.functions.TextExpressions
      .stopwordScores(col("text"), TextAnalysis.Stopwords.map(_._2)).getItem(0)
    val docs = T.documents(s, d)
      .select(col("doc_id"), stopEn.cast("long").as("stop_n"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"))
      .select(col("doc_id"), expr("(1000 * stop_n) div tokens").as("prio"),
        col("tokens"))
    Packing.selectTokenBudget(docs, "prio", "tokens", "doc_id", 10000L)
      .orderBy(col("doc_id"))
  }

  private val oSampleTokenBudget =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    (1000 * CAST(len(list_filter(string_split(lower(text), ' '),
       |        x -> list_contains(${stopListSql("en")}, x))) AS BIGINT))
       |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS prio,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
       |  FROM documents),
       |c AS (SELECT doc_id, prio, tokens,
       |        sum(tokens) OVER (ORDER BY prio DESC, doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM t)
       |SELECT doc_id, prio, tokens FROM c WHERE cum <= 10000
       |ORDER BY doc_id""".stripMargin

  // C36: domain-mixture resampling — target token weights 3:3:2:1…
  // over the source column, 12 000-token target; keep rates are the
  // declared integer arithmetic and membership is the shared
  // mod-prime permille bucket, so the whole selection is
  // engine-reproducible. Exports every kept doc with its source's
  // rate (doc-level so the gate checks membership, not just counts).
  def sampleMixtureQ(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).select(col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"))
    Packing.sampleMixture(docs, "source", "doc_id", col("tokens"),
        Map("src0" -> 3L, "src1" -> 3L, "src2" -> 2L),
        defaultWeight = 1L, targetTokens = 12000L)
      .select(col("doc_id"), col("source"), col("tokens"), col("keep_rate"))
      .orderBy(col("doc_id"))
  }

  private val oSampleMixture =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
      |  FROM documents),
      |avail AS (
      |  SELECT source, CAST(sum(tokens) AS BIGINT) AS avail,
      |    CAST(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 3
      |                     WHEN 'src2' THEN 2 ELSE 1 END AS BIGINT) AS w
      |  FROM tok GROUP BY source),
      |r AS (
      |  SELECT source,
      |    CAST(least(1000, CASE WHEN avail = 0 THEN 1000
      |      ELSE (1000 * ((12000 * w) // (SELECT sum(w) FROM avail))) // avail
      |      END) AS BIGINT) AS keep_rate
      |  FROM avail)
      |SELECT t.doc_id, t.source, t.tokens, r.keep_rate
      |FROM tok t JOIN r ON t.source = r.source
      |WHERE t.b < r.keep_rate
      |ORDER BY t.doc_id""".stripMargin

  // C49: mixture resampling with UPSAMPLING — src0 weighted 10×
  // against 19 default-weight sources, so its demand (~9.3k tokens)
  // far exceeds its ~1.4k supply: every src0 doc gets 6–7 copies
  // while the rest downsample — both regimes in one gate, copy-exact.
  def sampleMixtureUpsampleQ(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).select(col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"))
    Packing.sampleMixtureUpsample(docs, "source", "doc_id", col("tokens"),
        Map("src0" -> 10L), defaultWeight = 1L, targetTokens = 27000L)
      .select(col("doc_id"), col("copy_idx"), col("source"), col("tokens"),
        col("rate_permille"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  private val oSampleMixtureUpsample =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    ((doc_id % 1000000007) * 1000003) % 1000000007 % 1000 AS b
      |  FROM documents),
      |avail AS (
      |  SELECT source, CAST(sum(tokens) AS BIGINT) AS avail,
      |    CAST(CASE source WHEN 'src0' THEN 10 ELSE 1 END AS BIGINT) AS w
      |  FROM tok GROUP BY source),
      |r AS (
      |  SELECT source,
      |    CAST(CASE WHEN avail = 0 THEN 1000
      |      ELSE (1000 * ((27000 * w) // (SELECT sum(w) FROM avail))) // avail
      |      END AS BIGINT) AS rate_permille
      |  FROM avail),
      |copies AS (
      |  SELECT t.doc_id, t.source, t.tokens, r.rate_permille,
      |    r.rate_permille // 1000
      |      + CASE WHEN t.b < r.rate_permille % 1000 THEN 1 ELSE 0 END AS n_copies
      |  FROM tok t JOIN r ON t.source = r.source)
      |SELECT doc_id, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx,
      |  source, tokens, rate_permille
      |FROM copies WHERE n_copies > 0
      |ORDER BY doc_id, copy_idx""".stripMargin

  // B14: gap-based sessionization (1-hour gap) — per-user session
  // counts and the longest session, all integer outputs.
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("user_id"),
      expr("ts div 1000").as("ts_us"), col("event_id"))
    Temporal.sessionize(ev, Seq("user_id"), "ts_us", "event_id", 3600L * 1000000)
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("n")).as("longest_session"))
      .orderBy(col("user_id"))
  }

  // B99 (r10): peak concurrent sessions — the capacity question a
  // sessionized stream exists to answer ("how many users were on the
  // site AT ONCE"), composed from two already-gated cores: B14's gap
  // sessionizer produces (user, session) → [first, last] event-time
  // intervals on a MINUTE axis, and B91's sweep-line
  // (Relational.peakConcurrency, key = the whole site) nets same-
  // minute deltas and walks one running sum. The global axis is
  // bounded by the CALENDAR (31 days × 1440 minutes here), never by
  // sessions — the single-partition window is a ≤44k-row walk at any
  // traffic volume.
  def qConcurrentSessions(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("user_id"),
      expr("ts div 1000").as("ts_us"), col("event_id"))
    val sessions = Temporal.sessionize(ev, Seq("user_id"), "ts_us",
        "event_id", 3600L * 1000000)
      .groupBy("user_id", "session_id")
      .agg(expr("min(ts_us) div 60000000L").as("d0"),
        (expr("max(ts_us) div 60000000L") + 1L).as("d1x"))
    graft.queries.Relational.peakConcurrency(
        sessions.select(lit(1L).as("k"), col("d0"), col("d1x")))
      .select(col("peak_concurrent"),
        col("peak_day").cast("long").as("peak_minute"),
        col("n_intervals").as("n_sessions"))
  }

  private val oConcurrentSessions =
    """WITH g AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
      |      THEN 1 ELSE 0 END AS ns
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |s AS (
      |  SELECT user_id, ts_us,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us
      |                  ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      |  FROM g),
      |sess AS (
      |  SELECT user_id, session_id,
      |    min(ts_us) // 60000000 AS d0, max(ts_us) // 60000000 + 1 AS d1x
      |  FROM s GROUP BY 1, 2),
      |deltas AS (
      |  SELECT d0 AS dt, 1 AS delta FROM sess
      |  UNION ALL SELECT d1x, -1 FROM sess),
      |daily AS (
      |  SELECT dt, sum(delta) AS net,
      |    sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS starts
      |  FROM deltas GROUP BY dt),
      |run AS (
      |  SELECT dt,
      |    sum(net) OVER (ORDER BY dt ROWS UNBOUNDED PRECEDING) AS running,
      |    sum(starts) OVER () AS n_sessions
      |  FROM daily),
      |peak AS (
      |  SELECT dt, running, n_sessions, max(running) OVER () AS pk FROM run)
      |SELECT CAST(max(pk) AS BIGINT) AS peak_concurrent,
      |  CAST(min(dt) AS BIGINT) AS peak_minute,
      |  CAST(max(n_sessions) AS BIGINT) AS n_sessions
      |FROM peak WHERE running = pk""".stripMargin

  // B29 (r8): regular-grid resample + forward fill — per user, daily
  // buckets spanning the user's own event range; each day takes its
  // last observation (by ts, event_id), empty days carry the prior
  // day's value forward. Oracle restates it with generate_series +
  // IGNORE NULLS last_value.
  def qGapFill(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = T.events(s, d).select(col("user_id"),
      expr("ts div 1000").as("ts_us"), col("event_id"), col("value"))
    Temporal.gapFill(ev, Seq("user_id"), "ts_us", dayUs, "value",
      struct(col("ts_us"), col("event_id")))
      .orderBy(col("user_id"), col("bucket_ts"))
  }

  private val oGapFill =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
      |              (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_ts
      |            FROM events),
      |pb AS (SELECT user_id, bucket_ts, value FROM (
      |         SELECT *, row_number() OVER (PARTITION BY user_id, bucket_ts
      |           ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev) t
      |       WHERE rn = 1),
      |bounds AS (SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      |           FROM ev GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 86400000000)) AS bucket_ts
      |         FROM bounds)
      |SELECT g.user_id, g.bucket_ts,
      |  last_value(pb.value IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.bucket_ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
      |FROM grid g LEFT JOIN pb
      |  ON g.user_id = pb.user_id AND g.bucket_ts = pb.bucket_ts
      |ORDER BY g.user_id, g.bucket_ts""".stripMargin

  // B29b (r11): linear-interpolation resample — gapFill's other half
  // (draw the line between surrounding observations instead of
  // carrying the last one forward). Values as integer cents; empty
  // buckets interpolate over bucket INDICES with truncating integer
  // division, which the oracle emulates explicitly (DuckDB `//`
  // floors, Spark `div` truncates — they differ on negative slopes,
  // exactly the case a mixed-sign value column exercises).
  def qGapInterp(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = T.events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), round(col("value") * 100).cast("long").as("v_c"))
    Temporal.gapInterp(ev, Seq("user_id"), "ts_us", dayUs, "v_c",
      struct(col("ts_us"), col("event_id")))
      .orderBy(col("user_id"), col("bucket_ts"))
  }

  private val oGapInterp =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |              CAST(round(value * 100) AS BIGINT) AS v_c,
      |              epoch_us(ts) // 86400000000 AS bi
      |            FROM events WHERE value IS NOT NULL),
      |pb AS (SELECT user_id, bi, v_c FROM (
      |         SELECT *, row_number() OVER (PARTITION BY user_id, bi
      |           ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev) t
      |       WHERE rn = 1),
      |bounds AS (SELECT user_id, min(bi) AS lo, max(bi) AS hi
      |           FROM ev GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 1)) AS bi
      |         FROM bounds),
      |j AS (SELECT g.user_id, g.bi, pb.v_c AS anchor,
      |        last_value(pb.v_c IGNORE NULLS) OVER wp AS pv,
      |        last_value(CASE WHEN pb.v_c IS NOT NULL THEN g.bi END
      |          IGNORE NULLS) OVER wp AS pi,
      |        first_value(pb.v_c IGNORE NULLS) OVER wn AS nv,
      |        first_value(CASE WHEN pb.v_c IS NOT NULL THEN g.bi END
      |          IGNORE NULLS) OVER wn AS ni
      |      FROM grid g LEFT JOIN pb
      |        ON g.user_id = pb.user_id AND g.bi = pb.bi
      |      WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.bi
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |             wn AS (PARTITION BY g.user_id ORDER BY g.bi
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, bi * 86400000000 AS bucket_ts,
      |  CAST(CASE WHEN anchor IS NOT NULL THEN anchor
      |       ELSE pv + (CASE WHEN (nv - pv) * (bi - pi) >= 0
      |                  THEN ((nv - pv) * (bi - pi)) // (ni - pi)
      |                  ELSE -(((pv - nv) * (bi - pi)) // (ni - pi)) END)
      |       END AS BIGINT) AS v_c
      |FROM j ORDER BY user_id, bucket_ts""".stripMargin

  private val oSessionize =
    """WITH g AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000 THEN 1 ELSE 0 END AS ns
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |s AS (
      |  SELECT user_id,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us
      |                  ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      |  FROM g),
      |c AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions, max(n) AS longest_session
      |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  // B15: as-of join — each purchase gets the newest prior-or-equal
  // click of the same user (DuckDB ASOF JOIN is the oracle; Spark
  // composes it from an interleaved window, Temporal.asofJoin).
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_id"), col("user_id"),
      expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("click_ts_us"),
        col("event_id").as("click_event_id"))
    Temporal.asofJoin(purchases, clicks, Seq("user_id"),
        "ts_us", "click_ts_us", Seq("click_event_id"), "click_event_id")
      .select("event_id", "user_id", "ts_us", "click_event_id")
      .orderBy(col("event_id"))
  }

  private val oAsofJoin =
    """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, c.event_id AS click_event_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND epoch_us(p.ts) >= epoch_us(c.ts)
      |ORDER BY p.event_id""".stripMargin

  // B15b (r10): FORWARD as-of — the next click at or after each
  // purchase (re-engagement latency; Pandas merge_asof
  // direction='forward'). Same single-sort union machinery as B15,
  // reused through timestamp negation (Temporal.asofJoinForward) —
  // one implementation for both directions.
  def qAsofForward(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_id"), col("user_id"),
      expr("ts div 1000").as("ts_us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("click_ts_us"),
        col("event_id").as("next_click_id"))
    Temporal.asofJoinForward(purchases, clicks, Seq("user_id"),
        "ts_us", "click_ts_us", Seq("next_click_id"), "next_click_id")
      .select("event_id", "user_id", "ts_us", "next_click_id")
      .orderBy(col("event_id"))
  }

  private val oAsofForward =
    """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
      |  c.event_id AS next_click_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND epoch_us(p.ts) <= epoch_us(c.ts)
      |ORDER BY p.event_id""".stripMargin

  // B16: keyed interval join — clicks within the hour before each
  // purchase of the same user, counted per purchase (LEFT so
  // zero-click purchases stay).
  def qIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_id"), col("user_id"),
      expr("ts div 1000").as("ts_us"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts_us"),
        col("event_id").as("click_id"))
    // bucketed inner interval join, then counts re-attached LEFT so
    // zero-click purchases keep a row
    val counts = Temporal.intervalJoin(p, c, Seq("user_id"),
        "ts_us", "c_ts_us", 3600L * 1000000)
      .groupBy(col("event_id")).agg(count(col("click_id")).as("n"))
    p.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("n"), lit(0L)).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  private val oIntervalJoin =
    """SELECT p.event_id, count(c.event_id) AS n_clicks
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |           WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us <= p.ts_us
      |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin

  // B17: keyless range join — how many signup 7-day windows cover
  // each purchase. Since r11 the COUNT shape runs the pair-free
  // sweep decomposition (Temporal.coverageCounts — the sf1.0 probe
  // measured the bucketed join's candidate volume growing with
  // density²: ×30 runtime for ×10 data; the sweep is ∝ N log bucket).
  // rangeJoinBucketed remains the generic PAIR-producing operator,
  // law-spec-proven equal to this count on random data.
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_id"),
      expr("ts div 1000").as("ts_us"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us"))
    val sgn = ev.filter(col("event_type") === "signup")
      .select(col("ts_us").as("s_start"),
        (col("ts_us") + lit(7L * 86400000000L)).as("s_end"))
    Temporal.coverageCounts(p, "event_id", "ts_us", sgn,
        "s_start", "s_end", 86400000000L)
      .filter(col("n_covering") > 0)
      .select(col("event_id"), col("n_covering").as("n_windows"))
      .orderBy(col("event_id"))
  }

  private val oRangeJoin =
    """SELECT p.event_id, count(*) AS n_windows
      |FROM (SELECT event_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'purchase') p
      |JOIN (SELECT epoch_us(ts) AS s_start, epoch_us(ts) + 604800000000 AS s_end
      |      FROM events WHERE event_type = 'signup') s
      |  ON p.ts_us >= s.s_start AND p.ts_us <= s.s_end
      |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin

  // B20: approximate quantile — percentile_approx keeps exact samples
  // until the group outgrows `accuracy`, so at the gated SF it must
  // EQUAL the discrete median (a real data point; an interpolated
  // median sits between far-apart neighbors in small groups, which
  // is why a relative bound is the wrong gate). At 100 TB the same
  // expression degrades gracefully to a GK sketch within 1/accuracy
  // rank error.
  def qApproxQuantile(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(percentile_approx(round(col("o_totalprice") * 100), lit(0.5), lit(100000))
          .as("q50_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val oApproxQuantile =
    """SELECT o_orderpriority,
      |  quantile_disc(round(o_totalprice * 100), 0.5) AS q50_cents,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // B18: approximate distinct with a checked error bound — the query
  // exports exact + whether HLL landed within 5%; the oracle asserts
  // the bound (TRUE), so a sketch regression fails the hash gate.
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_raw"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_raw") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_5pct"))
      .orderBy(col("event_type"))

  private val oApproxDistinct =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  TRUE AS within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // B18b (r10): sketch set algebra — approximate INTERSECTION via
  // inclusion–exclusion (|A∩B| ≈ |A|+|B|−|A∪B|, each term an HLL
  // estimate): the audience-overlap question ("viewers who also
  // purchased") answered without ever materializing either side. The
  // standard caveat is part of the gate: intersection error scales
  // with the UNION's size, not the intersection's, so the checked
  // bound is 5% OF THE UNION — and the export carries the exact
  // terms so the oracle re-proves both the arithmetic and the bound.
  def qHllIntersect(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_type"), col("user_id"))
    val a = ev.filter(col("event_type") === "view").select(col("user_id"))
    val b = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val approx = a.agg(approx_count_distinct(col("user_id")).as("ca")).crossJoin(
      b.agg(approx_count_distinct(col("user_id")).as("cb"))).crossJoin(
      a.unionAll(b).agg(approx_count_distinct(col("user_id")).as("cu")))
      .select((col("ca") + col("cb") - col("cu")).as("approx_intersect"))
    val exact = a.distinct().join(b.distinct(), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("exact_intersect")).crossJoin(
      a.agg(countDistinct(col("user_id")).as("exact_a"))).crossJoin(
      b.agg(countDistinct(col("user_id")).as("exact_b"))).crossJoin(
      a.unionAll(b).agg(countDistinct(col("user_id")).as("exact_union")))
    exact.crossJoin(approx)
      .select(col("exact_a"), col("exact_b"), col("exact_union"),
        col("exact_intersect"),
        (abs(col("approx_intersect") - col("exact_intersect")) <=
          col("exact_union") * lit(0.05)).as("within_5pct_of_union"))
  }

  private val oHllIntersect =
    """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT
      |  CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
      |  CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
      |  CAST((SELECT count(*) FROM (SELECT user_id FROM a
      |    UNION SELECT user_id FROM b)) AS BIGINT) AS exact_union,
      |  CAST((SELECT count(*) FROM a JOIN b USING (user_id)) AS BIGINT)
      |    AS exact_intersect,
      |  TRUE AS within_5pct_of_union""".stripMargin

  // C19: incremental distinct maintenance — sketch two disjoint
  // load-ts windows separately (as successive pipeline runs would),
  // union the sketches, and check the estimate against the exact
  // distinct over the whole span. Oracle asserts the 5% bound (TRUE),
  // so both a sketch regression AND a broken merge fail the gate.
  def qHllIncremental(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_type"), col("user_id"),
      expr("ts div 1000").as("ts_us"))
    val mid = CdcEnvelope.epochUs("2024-01-15T00:00:00Z")
    val w1 = Sketches.sketchBy(ev.filter(col("ts_us") <= mid), Seq("event_type"), col("user_id"))
    val w2 = Sketches.sketchBy(ev.filter(col("ts_us") > mid), Seq("event_type"), col("user_id"))
    val merged = Sketches.unionEstimate(w1.unionByName(w2), Seq("event_type"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(merged, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_distinct") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_5pct"))
      .orderBy(col("event_type"))
  }

  private val oHllIncremental =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  TRUE AS within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // C33 (r5): incremental quantile maintenance — two disjoint windows
  // sketched separately (as successive pipeline runs would), merged
  // losslessly, and the estimate checked against the exact k-th
  // smallest (k = ceil(0.5·n)) with the provable one-bin-width bound.
  // The oracle asserts the bound (TRUE), so a sketch/merge regression
  // fails the hash gate — same contract as C19's HLL gate.
  def qQuantileIncremental(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (lo, hi, bins) = (0L, 60000L, 1024)
    val width = (hi - lo).toDouble / bins
    val ev = T.events(s, d).select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"),
      expr("ts div 1000").as("ts_us"))
    val mid = CdcEnvelope.epochUs("2024-01-15T00:00:00Z")
    val s1 = Sketches.histSketch(ev.filter(col("ts_us") <= mid),
      Seq("event_type"), col("cents"), lo, hi, bins)
    val s2 = Sketches.histSketch(ev.filter(col("ts_us") > mid),
      Seq("event_type"), col("cents"), lo, hi, bins)
    val est = Sketches.histQuantile(
      Sketches.histMerge(s1.unionByName(s2), Seq("event_type")),
      Seq("event_type"), 0.5, lo, hi, bins)
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val exact = ev.join(counts, "event_type")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("cents"))))
      .filter(col("rn") === ceil(lit(0.5) * col("n")).cast("long"))
      .select(col("event_type"), col("n"), col("cents").as("exact_cents"))
    exact.join(est, "event_type")
      .select(col("event_type"), col("n"), col("exact_cents"),
        (abs(col("q_est") - col("exact_cents")) <= lit(width)).as("within_bin"))
      .orderBy(col("event_type"))
  }

  private val oQuantileIncremental =
    """WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |            FROM events),
      |k AS (SELECT event_type, cents,
      |        row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
      |        count(*) OVER (PARTITION BY event_type) AS n
      |      FROM ev)
      |SELECT event_type, CAST(n AS BIGINT) AS n, cents AS exact_cents,
      |  TRUE AS within_bin
      |FROM k WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
      |ORDER BY event_type""".stripMargin

  // C12 (driver-gated r8, r7 verdict #7): the REAL image decode path
  // under the per-round gate. Fixture images are rendered in-flight —
  // one solid-gray PNG per selected doc, dims and gray level all
  // arithmetic functions of doc_id — then decoded BACK through the
  // library's ImageIO operators: extractDims (header parse) for
  // width/height/format, extractFeatures (full pixel decode) for the
  // luminance signature. Every output is therefore predictable in
  // SQL: if decode broke (or fell back to the byte stub), dims or
  // the pixel-derived gray would diverge and the hash compare fails.
  def multimodalDims(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 7 === 0)
      .as[Long]
      .map { id =>
        (id, "image/png",
          Multimodal.synthPng((8 + id % 16).toInt, (4 + id % 8).toInt, (id % 256).toInt))
      }
      .toDF("media_id", "media_type", "bytes")
    val dims = Multimodal.extractDims(media)
    val gray = Multimodal.extractFeatures(media, dim = 4)
      .select(col("media_id"),
        round(element_at(col("features"), 1) * lit(256.0)).cast("long").as("gray"))
    dims.join(gray, "media_id")
      .select(col("media_id").as("doc_id"), col("width"), col("height"),
        col("format"), col("gray"))
      .orderBy(col("doc_id"))
  }

  private val oMultimodalDims =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(8 + doc_id % 16 AS INT) AS width,
      |  CAST(4 + doc_id % 8 AS INT) AS height,
      |  'png' AS format,
      |  CAST(doc_id % 256 AS BIGINT) AS gray
      |FROM documents WHERE doc_id % 7 = 0
      |ORDER BY doc_id""".stripMargin

  // C62 (r9): perceptual-hash image dedup — the pixel-level
  // duplicate detection every multimodal training pipeline runs
  // (the same photo arrives as a PNG and a BMP/JPEG re-encode; byte
  // hashing can never see it). Fixture: 8 pattern classes, each
  // rendered into BOTH containers (lossless for these pixels), so
  // the dHash grouping must (a) collide same-pixel images ACROSS
  // container formats and (b) separate the 8 classes — the oracle
  // re-derives groups from the fixture arithmetic alone, so a hash
  // collision, a decode drift, or a grouping bug all break it.
  // n_formats = 2 per group is the cross-container proof (sniffed
  // from the bytes by the real header parse, not the label). Scale
  // shape: one size-budgeted decode pass, then dedup is a hash agg
  // on an 8-byte key — shuffle ∝ blobs, never bytes.
  def multimodalImageDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 5 === 0)
      .as[Long]
      .map { id =>
        val fmt = if ((id / 8) % 2 == 0) "png" else "bmp"
        (id, s"image/$fmt",
          Multimodal.synthPatternImage(24, 16, (id % 8).toInt, fmt))
      }
      .toDF("media_id", "media_type", "bytes")
    Multimodal.extractDHash(media)
      .join(Multimodal.extractDims(media), "media_id")
      .groupBy("dhash")
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_members"),
        countDistinct(col("format")).as("n_formats"),
        max(col("width")).as("width"), max(col("height")).as("height"))
      .select("keep_id", "n_members", "n_formats", "width", "height")
      .orderBy("keep_id")
  }

  private val oMultimodalImageDedup =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_members,
      |  count(DISTINCT (doc_id // 8) % 2) AS n_formats,
      |  24 AS width, 16 AS height
      |FROM documents WHERE doc_id % 5 = 0
      |GROUP BY doc_id % 8 ORDER BY keep_id""".stripMargin

  // C12b (r8): the non-image modality — WAV audio rendered in-flight
  // (PCM-16, rate/channels/frames arithmetic functions of doc_id via
  // the JDK's own writer), then probed BACK through extractAudioInfo
  // (javax.sound.sampled header parse). Same render→probe→predict
  // shape as multimodal_dims: a broken probe breaks the hash.
  def multimodalAudio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 11 === 0)
      .as[Long]
      .map { id =>
        (id, "audio/wav",
          Multimodal.synthWav((8000 + (id % 4) * 4000).toInt,
            (1 + id % 2).toInt, (100 + id % 50).toInt))
      }
      .toDF("media_id", "media_type", "bytes")
    Multimodal.extractAudioInfo(media)
      .select(col("media_id").as("doc_id"), col("sample_rate"), col("channels"),
        col("frames"), col("encoding"))
      .orderBy(col("doc_id"))
  }

  private val oMultimodalAudio =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(100 + doc_id % 50 AS BIGINT) AS frames,
      |  'pcm_signed' AS encoding
      |FROM documents WHERE doc_id % 11 = 0
      |ORDER BY doc_id""".stripMargin

  // C12c: the video modality probe, same gate shape as
  // multimodal_audio — hand-built ISO BMFF containers with arithmetic
  // dims/duration per doc_id, box-walked back; the oracle predicts
  // every parsed field in SQL, so a broken walk (or a stub) breaks
  // the hash.
  def multimodalVideo(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 13 === 0)
      .as[Long]
      .map { id =>
        (id, "video/mp4",
          Multimodal.synthMp4((320 + (id % 8) * 160).toInt,
            (180 + (id % 8) * 90).toInt, 1000L + (id % 120) * 500L))
      }
      .toDF("media_id", "media_type", "bytes")
    Multimodal.extractVideoInfo(media)
      .select(col("media_id").as("doc_id"), col("width"), col("height"),
        col("duration_ms"), col("brand"))
      .orderBy(col("doc_id"))
  }

  private val oMultimodalVideo =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(320 + (doc_id % 8) * 160 AS INT) AS width,
      |  CAST(180 + (doc_id % 8) * 90 AS INT) AS height,
      |  CAST(1000 + (doc_id % 120) * 500 AS BIGINT) AS duration_ms,
      |  'isom' AS brand
      |FROM documents WHERE doc_id % 13 = 0
      |ORDER BY doc_id""".stripMargin

  // C107b (r10): audio hop-window schedule — C107's analog for the
  // audio modality (feature extraction runs on fixed windows with a
  // hop): n_windows = (frames − win) div hop + 1 from the REAL C12b
  // WAV header parse (win 40 / hop 25 samples against the fixture's
  // 100–149-frame clips), offsets exploded metadata-sized. The STFT
  // the offsets feed is the documented out-of-container stub; the
  // schedule and its plumbing are real and hashed.
  def multimodalAudioWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 11 === 0)
      .as[Long]
      .map { id =>
        (id, "audio/wav",
          Multimodal.synthWav((8000 + (id % 4) * 4000).toInt,
            (1 + id % 2).toInt, (100 + id % 50).toInt))
      }
      .toDF("media_id", "media_type", "bytes")
    Multimodal.extractAudioInfo(media)
      .select(col("media_id").as("doc_id"), col("frames"))
      .withColumn("n_windows",
        greatest(expr("(frames - 40L) div 25L + 1L"), lit(0L)))
      .select(col("doc_id"), col("frames"), col("n_windows"),
        explode(expr("sequence(0L, n_windows - 1L)")).as("window_idx"))
      .withColumn("offset_frames", col("window_idx") * 25L)
      .orderBy("doc_id", "window_idx")
  }

  private val oMultimodalAudioWindows =
    """WITH a AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(100 + doc_id % 50 AS BIGINT) AS frames,
      |    greatest((CAST(100 + doc_id % 50 AS BIGINT) - 40) // 25 + 1, 0)
      |      AS n_windows
      |  FROM documents WHERE doc_id % 11 = 0)
      |SELECT doc_id, frames, n_windows,
      |  CAST(w AS BIGINT) AS window_idx,
      |  CAST(w AS BIGINT) * 25 AS offset_frames
      |FROM a, unnest(range(0, CAST(n_windows AS INT))) AS t(w)
      |ORDER BY doc_id, window_idx""".stripMargin

  // C12d (r11): PCM sample-statistics probe — the step PAST C12b's
  // header parse: the WAV sample payload itself is decoded through
  // the JDK audio stack and reduced to loudness/clipping statistics
  // per blob (the screen an audio curation pipeline runs before any
  // feature extraction). Same render→probe→predict gate shape as the
  // other modality probes: synthWav's PCM ramp is the closed form
  // v_i = (i·257) mod 32768 over i < frames·channels, so the oracle
  // predicts every decoded statistic arithmetically — a broken
  // endianness branch, frame count, or sample parse breaks the hash.
  def multimodalPcm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 11 === 0)
      .as[Long]
      .map { id =>
        (id, "audio/wav",
          Multimodal.synthWav((8000 + (id % 4) * 4000).toInt,
            (1 + id % 2).toInt, (100 + id % 50).toInt))
      }
      .toDF("media_id", "media_type", "bytes")
    Multimodal.extractPcmStats(media)
      .select(col("media_id").as("doc_id"), col("n_samples"), col("peak"),
        col("sum_sq"), col("dc_ppm"), col("clip_n"))
      .orderBy(col("doc_id"))
  }

  private val oMultimodalPcm =
    """WITH a AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST((100 + doc_id % 50) * (1 + doc_id % 2) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 11 = 0),
      |s AS (
      |  SELECT doc_id, n, (CAST(i AS BIGINT) * 257) % 32768 AS v
      |  FROM a, unnest(range(CAST(n AS INT))) AS t(i))
      |SELECT doc_id, n AS n_samples,
      |  CAST(max(v) AS INT) AS peak,
      |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
      |  CAST(sum(v) AS BIGINT) * 1000000 // n AS dc_ppm,
      |  CAST(sum(CASE WHEN v >= 30000 THEN 1 ELSE 0 END) AS BIGINT) AS clip_n
      |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin

  // C107 (r10): frame-sampling schedule — the manifest a video
  // training pipeline emits per clip (which timestamps to decode)
  // BEFORE any pixel work is scheduled: uniform sampling with a cap
  // (n = min(1 + duration/400ms, 8); offset_k = duration·k/n, floor
  // arithmetic — every engine agrees). The duration comes from the
  // REAL C12c box walk over the ISO BMFF container, not from the
  // fixture formula — a broken mvhd parse breaks every offset — and
  // the explode is metadata-sized (≤8 rows per clip; the pixel decode
  // those offsets feed is the documented out-of-container stub, the
  // schedule and its Spark plumbing are the real, tested part).
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = T.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % 13 === 0)
      .as[Long]
      .map { id =>
        (id, "video/mp4",
          Multimodal.synthMp4((320 + (id % 8) * 160).toInt,
            (180 + (id % 8) * 90).toInt, 1000L + (id % 120) * 500L))
      }
      .toDF("media_id", "media_type", "bytes")
    Multimodal.extractVideoInfo(media)
      .select(col("media_id").as("doc_id"), col("duration_ms"))
      .withColumn("n_frames",
        least(lit(1L) + expr("duration_ms div 400L"), lit(8L)))
      .select(col("doc_id"), col("duration_ms"), col("n_frames"),
        explode(expr("sequence(0L, n_frames - 1L)")).as("frame_idx"))
      .withColumn("offset_ms", expr("duration_ms * frame_idx div n_frames"))
      .orderBy("doc_id", "frame_idx")
  }

  private val oMultimodalFrames =
    """WITH v AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(1000 + (doc_id % 120) * 500 AS BIGINT) AS duration_ms,
      |    least(1 + CAST(1000 + (doc_id % 120) * 500 AS BIGINT) // 400, 8)
      |      AS n_frames
      |  FROM documents WHERE doc_id % 13 = 0)
      |SELECT doc_id, duration_ms, n_frames,
      |  CAST(f AS BIGINT) AS frame_idx,
      |  duration_ms * f // n_frames AS offset_ms
      |FROM v, unnest(range(0, CAST(n_frames AS INT))) AS t(f)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // C75 (r9): host-graph PageRank centrality — the crawl-curation
  // link signal (Graphs.pageRankInt doc). The link graph is BUILT
  // from known columns (the C56 fixture discipline): every document
  // links its own host (source.example.com's source label) to host
  // 'src'||((doc_id*7+3) % 20) — a deterministic, skewed, cyclic
  // 20-node graph with self-loops dropped — so the oracle re-derives
  // the EDGE LIST from first principles and then replays the exact
  // three-iteration fixed-point BIGINT arithmetic the implementation
  // defines (division-first shares, 85/100 rational damping). Ranks,
  // degree profile, and the centrality ORDER are all pinned; the
  // final |hosts|-row ranking window is post-aggregation state,
  // never per-document.
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val e0 = T.documents(s, d).select(col("source").as("src"),
      concat(lit("src"), (col("doc_id") * 7 + 3) % 20).as("dst"))
    val edges = e0.filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
    val ranks = Graphs.pageRankInt(edges, iters = 3)
    val outd = edges.groupBy("src").agg(count(lit(1)).as("n_out"),
      sum("weight").as("out_w"))
    val ind = edges.groupBy("dst").agg(sum("weight").as("in_w"))
    val board = ranks
      .join(outd.withColumnRenamed("src", "node"), Seq("node"), "left")
      .join(ind.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node").as("host"), col("rank"),
        coalesce(col("n_out"), lit(0L)).as("n_out"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))
    // the centrality leaderboard rank: ∝ hosts, so the global
    // position comes from the C74 partition-wise prefix, not an
    // unpartitioned window (r12 eager-audit finding)
    Prefix.globalRank(board, "rk", Seq(col("rank").desc, col("host")))._1
      .select("host", "rank", "n_out", "out_w", "in_w", "rk")
      .orderBy("rk")
  }

  /** One DuckDB power-iteration step over the shared `le` CTE —
    * chained K times by [[oGraphPagerank]] (mirrors
    * `Graphs.pageRankInt`'s loop body term for term).
    */
  private def oPrStep(prev: String, out: String): String =
    s"""$out AS (
       |  SELECT n.node,
       |    CAST(150000000000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT)
       |      AS rank
       |  FROM nodes n LEFT JOIN (
       |    SELECT le.dst AS node, sum((r.rank // le.outw) * le.weight) AS mass
       |    FROM $prev r JOIN le ON r.node = le.src GROUP BY le.dst) m
       |  USING (node))""".stripMargin

  private val oGraphPagerank =
    s"""WITH e0 AS (
       |  SELECT source AS src,
       |    'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
       |  FROM documents),
       |edges AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS weight
       |  FROM e0 WHERE src <> dst GROUP BY src, dst),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |outw AS (SELECT src, sum(weight) AS outw FROM edges GROUP BY src),
       |le AS (SELECT e.src, e.dst, e.weight, o.outw
       |       FROM edges e JOIN outw o USING (src)),
       |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
       |${oPrStep("r0", "r1")},
       |${oPrStep("r1", "r2")},
       |${oPrStep("r2", "r3")},
       |deg AS (
       |  SELECT n.node,
       |    CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_out,
       |    CAST(coalesce(o.out_w, 0) AS BIGINT) AS out_w,
       |    CAST(coalesce(i.in_w, 0) AS BIGINT) AS in_w
       |  FROM nodes n
       |  LEFT JOIN (SELECT src AS node, count(*) AS n_out, sum(weight) AS out_w
       |             FROM edges GROUP BY src) o USING (node)
       |  LEFT JOIN (SELECT dst AS node, sum(weight) AS in_w
       |             FROM edges GROUP BY dst) i USING (node))
       |SELECT r.node AS host, r.rank, d.n_out, d.out_w, d.in_w,
       |  CAST(row_number() OVER (ORDER BY r.rank DESC, r.node) AS BIGINT) AS rk
       |FROM r3 r JOIN deg d ON r.node = d.node
       |ORDER BY rk""".stripMargin

  // C79 (r9): multi-source BFS hop distances over a host graph
  // (Graphs.bfsHops doc — crawl-depth priors / spam-neighborhood
  // quarantine). The graph is BUILT from known columns (C56/C75
  // fixture discipline): every document adds h(doc_id%40) →
  // h((7·doc_id+3)%40) and h(doc_id%40) → h((3·doc_id+1)%40) — a
  // deterministic out-degree-2 functional graph where many nodes are
  // reachable at SEVERAL depths, so the min-dist/anti-join law is
  // exercised on real collisions. Seeds h0, h1; 4 hops. The oracle
  // replays the BFS as four chained frontier CTEs.
  def graphBfsHops(s: SparkSession, d: String): DataFrame = {
    val doc = T.documents(s, d)
    val edges = doc.select(
        concat(lit("h"), col("doc_id") % 40).as("src"),
        concat(lit("h"), (col("doc_id") * 7 + 3) % 40).as("dst"))
      .union(doc.select(
        concat(lit("h"), col("doc_id") % 40).as("src"),
        concat(lit("h"), (col("doc_id") * 3 + 1) % 40).as("dst")))
      .filter(col("src") =!= col("dst"))
    val seeds = s.range(2).select(concat(lit("h"), col("id")).as("node"))
    Graphs.bfsHops(edges, seeds, maxHops = 4)
      .select(col("node").as("host"), col("dist"))
      .orderBy("dist", "host")
  }

  /** One DuckDB BFS round: frontier k = unvisited successors of
    * visited set k−1; visited k = union. Mirrors `Graphs.bfsHops`.
    */
  private def oBfsStep(k: Int): String =
    s"""f$k AS (
       |  SELECT DISTINCT e.dst AS node FROM edges e
       |  JOIN v${k - 1} v ON e.src = v.node
       |  WHERE e.dst NOT IN (SELECT node FROM v${k - 1})),
       |v$k AS (
       |  SELECT node, dist FROM v${k - 1}
       |  UNION ALL SELECT node, CAST($k AS BIGINT) FROM f$k)""".stripMargin

  private val oGraphBfsHops =
    s"""WITH e0 AS (
       |  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) AS src,
       |    'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR),
       |    'h' || CAST((doc_id * 3 + 1) % 40 AS VARCHAR)
       |  FROM documents),
       |edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       |v0 AS (SELECT 'h0' AS node, CAST(0 AS BIGINT) AS dist
       |       UNION ALL SELECT 'h1', 0),
       |${oBfsStep(1)},
       |${oBfsStep(2)},
       |${oBfsStep(3)},
       |${oBfsStep(4)}
       |SELECT node AS host, dist FROM v4 ORDER BY dist, host""".stripMargin

  // C88: edit-distance near-dup verification — character-level
  // confirmation over deterministically-blocked candidates (the
  // oracle-portable feed; production wires C2's LSH pairs in). The
  // universe is capped at 2000 docs (full corpus at the driver's
  // correctness SF; bounds the bucket-quadratic step at bench SF —
  // the same C3 discipline). Every output is exact integer:
  // levenshtein distance, char lengths, truncating-ppm similarity,
  // and the ≥0.7 verdict flag.
  def dedupEditDistance(s: SparkSession, d: String): DataFrame =
    Dedup.editDistancePairs(T.documents(s, d).filter(col("doc_id") < 2000))
      .orderBy("id_a", "id_b")

  private val oDedupEditDistance =
    """WITH b AS (
      |  SELECT doc_id, source, text, CAST(length(text) AS BIGINT) AS len,
      |    length(text) // 32 AS bucket
      |  FROM documents WHERE doc_id < 2000),
      |p AS (
      |  SELECT a.source AS source, a.doc_id AS id_a, b2.doc_id AS id_b,
      |    CAST(levenshtein(a.text, b2.text) AS BIGINT) AS dist,
      |    a.len AS len_a, b2.len AS len_b
      |  FROM b a JOIN b b2
      |    ON a.source = b2.source AND a.bucket = b2.bucket
      |    AND a.doc_id < b2.doc_id)
      |SELECT source, id_a, id_b, dist, len_a, len_b,
      |  1000000 - dist * 1000000 // greatest(len_a, len_b, 1) AS sim_ppm,
      |  CASE WHEN 1000000 - dist * 1000000 // greatest(len_a, len_b, 1)
      |       >= 700000 THEN 1 ELSE 0 END AS is_near
      |FROM p ORDER BY id_a, id_b""".stripMargin

  // C2∘C88 (r10): the production-shape edit-distance dedup — LSH
  // candidates → levenshtein confirm (the path editDistancePairs'
  // own doc declares for production; dedup_edit_distance stays the
  // blocked-feed truth). The oracle is the EXACT all-pairs truth at
  // the same integer verdict, prefiltered only by the length bound
  // edit distance itself implies (dist ≥ |len_a − len_b|, so
  // sim ≥ 0.7 forces the lengths within 30%) — a hash match proves
  // the MinHash candidate feed missed NO true near pair on this
  // corpus AND the confirm arithmetic matches DuckDB. Universe
  // capped at 350 docs to bound the oracle's quadratic DP.
  def dedupLshEditVerify(s: SparkSession, d: String): DataFrame =
    Dedup.lshEditVerify(T.documents(s, d).filter(col("doc_id") < 350))
      .orderBy("id_a", "id_b")

  private val oDedupLshEditVerify =
    """WITH d AS MATERIALIZED (
      |  SELECT doc_id, text, CAST(len(text) AS BIGINT) AS l
      |  FROM documents WHERE doc_id < 350),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
      |    a.l AS len_a, b.l AS len_b
      |  FROM d a JOIN d b ON a.doc_id < b.doc_id
      |    AND abs(a.l - b.l) * 1000000 <= 300000 * greatest(a.l, b.l, 1))
      |SELECT id_a, id_b, dist, len_a, len_b,
      |  1000000 - dist * 1000000 // greatest(len_a, len_b, 1) AS sim_ppm
      |FROM p
      |WHERE 1000000 - dist * 1000000 // greatest(len_a, len_b, 1) >= 700000
      |ORDER BY id_a, id_b""".stripMargin

  // C89: chat-template / special-token leakage audit. The synthetic
  // corpus is clean, so the gate INJECTS the five marker families
  // deterministically on both engines (the C83/C44 injected-fixture
  // discipline): doc_id‰17 appends an <|endoftext|>-style special
  // token, ‰23 prepends [INST], ‰29 appends a ### heading, ‰31
  // appends a {{moustache}}, ‰37 prepends <s> — overlaps are real
  // multi-marker docs. Per-source report: per-marker doc counts,
  // any-marker count, integer-ppm leakage rate.
  def textTemplateLeakage(s: SparkSession, d: String): DataFrame = {
    val t0 = col("text")
    val t1 = when(col("doc_id") % 17 === 0,
      concat(t0, lit(" <|endoftext|>"))).otherwise(t0)
    val t2 = when(col("doc_id") % 23 === 0,
      concat(lit("[INST] "), t1)).otherwise(t1)
    val t3 = when(col("doc_id") % 29 === 0,
      concat(t2, lit(" ### Response:"))).otherwise(t2)
    val t4 = when(col("doc_id") % 31 === 0,
      concat(t3, lit(" {{user}}"))).otherwise(t3)
    val t5 = when(col("doc_id") % 37 === 0,
      concat(lit("<s> "), t4)).otherwise(t4)
    TextAnalysis.templateLeakage(
      T.documents(s, d).select(col("source"), t5.as("text")))
      .orderBy("source")
  }

  private val oTextTemplateLeakage =
    """WITH inj AS (
      |  SELECT source,
      |    (CASE WHEN doc_id % 37 = 0 THEN '<s> ' ELSE '' END)
      |    || (CASE WHEN doc_id % 23 = 0 THEN '[INST] ' ELSE '' END)
      |    || text
      |    || (CASE WHEN doc_id % 17 = 0 THEN ' <|endoftext|>' ELSE '' END)
      |    || (CASE WHEN doc_id % 29 = 0 THEN ' ### Response:' ELSE '' END)
      |    || (CASE WHEN doc_id % 31 = 0 THEN ' {{user}}' ELSE '' END)
      |    AS text
      |  FROM documents),
      |fl AS (
      |  SELECT source,
      |    CASE WHEN contains(text, '<|') THEN 1 ELSE 0 END AS f_special,
      |    CASE WHEN contains(text, '[INST]') THEN 1 ELSE 0 END AS f_inst,
      |    CASE WHEN contains(text, '###') THEN 1 ELSE 0 END AS f_heading,
      |    CASE WHEN contains(text, '<s>') THEN 1 ELSE 0 END AS f_bos,
      |    CASE WHEN contains(text, '{{') THEN 1 ELSE 0 END AS f_moustache
      |  FROM inj)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(f_special) AS BIGINT) AS n_special,
      |  CAST(sum(f_inst) AS BIGINT) AS n_inst,
      |  CAST(sum(f_heading) AS BIGINT) AS n_heading,
      |  CAST(sum(f_bos) AS BIGINT) AS n_bos,
      |  CAST(sum(f_moustache) AS BIGINT) AS n_moustache,
      |  CAST(sum(greatest(f_special, f_inst, f_heading, f_bos,
      |                    f_moustache)) AS BIGINT) AS n_flagged,
      |  CAST(sum(greatest(f_special, f_inst, f_heading, f_bos, f_moustache))
      |    * 1000000 // count(*) AS BIGINT) AS flagged_ppm
      |FROM fl GROUP BY source ORDER BY source""".stripMargin

  // C90 (r9): deterministic quality-weighted sampling — keep each
  // doc with probability ∝ its integer quality weight, the mixture
  // knob between exact stratified rates (C20) and α-temperature
  // resampling (C70). Engine-reproducible Bernoulli draw: the
  // uniform is the first five md5 nibbles of "wsamp1:<doc_id>"
  // (C34's portable digest order, the C58 instr nibble arithmetic —
  // deliberately lowest-common-denominator SQL), reduced mod 10⁶;
  // keep iff u_ppm < w·120000, so w=5 docs sample at 60% and w=1 at
  // 12% — same seed reproduces the exact sample on any engine,
  // growth only adds draws. Weight = 1 + min(4, n_chars/100): an
  // integer derived from the data, standing in for any upstream
  // quality score. Shapes: pure per-row projection, zero shuffles;
  // the export orders by doc_id only for the gate.
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val nib = (i: Int) =>
      s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)"
    val u = s"((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + " +
      s"${nib(4)}) * 16 + ${nib(5)}) % 1000000"
    T.documents(s, d)
      .select(col("doc_id"),
        expr("1L + least(4L, n_chars DIV 100)").as("w"),
        md5(concat(lit("wsamp1:"), col("doc_id").cast("string"))).as("h"))
      .select(col("doc_id"), col("w"), expr(s"CAST($u AS BIGINT)").as("u_ppm"))
      .withColumn("kept", (col("u_ppm") < col("w") * lit(120000L)).cast("long"))
      .orderBy("doc_id")
  }

  private val oSampleWeighted = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"""WITH k AS (
       |  SELECT doc_id, 1 + least(4, n_chars // 100) AS w,
       |    md5('wsamp1:' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents)
       |SELECT doc_id, CAST(w AS BIGINT) AS w,
       |  CAST(((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 +
       |    ${nib(4)}) * 16 + ${nib(5)}) % 1000000 AS BIGINT) AS u_ppm,
       |  CAST(CASE WHEN ((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)})
       |    * 16 + ${nib(4)}) * 16 + ${nib(5)}) % 1000000 < w * 120000
       |    THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM k ORDER BY doc_id""".stripMargin
  }

  // C91 (r9): compressibility proxy — distinct-vs-total character
  // 4-gram ratio per document, the cheap stand-in for "would gzip
  // crush this" that flags templated/looping text a word-level
  // repetition screen (C22) misses (character-level loops, repeated
  // separators). One codegen'd per-row projection: enumerate the
  // len−3 grams with sequence+transform (array bounded by doc
  // length — no explode, no shuffle), count distinct in place with
  // array_distinct; ratio as truncating ppm. Low ratio = repetitive.
  // Scale: embarrassingly parallel over a 2-column pruned scan.
  def textCompressibility(s: SparkSession, d: String): DataFrame =
    // r14: spread the scan — the per-doc gram enumeration +
    // array_distinct is the dominant CPU and ran single-task on the
    // one-row-group corpus file (Spread).
    Spread(T.documents(s, d)
      .filter(length(col("text")) >= 4)
      .select("doc_id", "text"))
      .select(col("doc_id"),
        expr("transform(sequence(1, length(text) - 3), i -> substring(text, i, 4))")
          .as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct"))
      .withColumn("ratio_ppm", expr("n_distinct * 1000000L DIV n_grams"))
      .orderBy("doc_id")

  private val oTextCompressibility =
    """WITH g AS (
      |  SELECT doc_id,
      |    [substr(text, i, 4) for i in range(1, length(text) - 2)] AS l
      |  FROM documents WHERE length(text) >= 4)
      |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_grams,
      |  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(l)) * 1000000 // len(l) AS BIGINT)
      |    AS ratio_ppm
      |FROM g ORDER BY doc_id""".stripMargin

  // C92 (r9): fixed-centroid cluster assignment — route every vector
  // to its nearest of k pinned centroids (cosine argmax), the
  // serving half of IVF/k-means topic bucketing exposed as its own
  // gate: with centroids = the k lowest vec_ids (a deterministic
  // stand-in for C23-trained centroids, which the oracle could not
  // re-train), the assignment is pure data. Ties and float-margin
  // flips are broken by centroid id through an integer-packed argmin
  // ((1−cos)·2⁴⁰ + cid — identical packing both engines, so even a
  // bit-for-bit cosine tie resolves the same way). Scale: k
  // centroids broadcast, ONE streaming pass over the corpus, per-row
  // k-term argmax folded map-side — the IVF route step's exact
  // shape. Export = assignment detail rows (the strongest hash).
  def annCentroidAssign(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("emb_c"))
    e.filter(col("vec_id") >= 8)
      .select(col("vec_id"), col("embedding").as("emb_q"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        Similarity.cosine(col("emb_q"), col("emb_c")).as("cos"))
      .groupBy("vec_id")
      .agg(min(expr(
        "CAST(round((1.0d - cos) * 1099511627776d) AS BIGINT) * 64 + cid"))
        .as("packed"))
      .select(col("vec_id"), expr("packed % 64").as("centroid"))
      .orderBy("vec_id")
  }

  private val oAnnCentroidAssign =
    """WITH c AS (
      |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS emb_c
      |  FROM embeddings WHERE vec_id < 8),
      |s AS (
      |  SELECT e.vec_id, c.cid,
      |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.emb_c)
      |      AS cos
      |  FROM embeddings e, c WHERE e.vec_id >= 8)
      |SELECT vec_id,
      |  CAST(min(CAST(round((1.0 - cos) * 1099511627776) AS BIGINT) * 64
      |    + cid) % 64 AS BIGINT) AS centroid
      |FROM s GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // C93 (r9): dedup savings report — the per-source accounting that
  // justifies a dedup pass before anyone runs it: how many rows and
  // characters does exact dedup reclaim, attributed to the source of
  // each NON-KEEPER copy (duplicates cross sources, so the group key
  // is the global text hash and the keeper is the C1 min-doc_id
  // canonical). Shapes: ONE md5 hash agg for keepers (map-side
  // combine), one co-keyed join back on the hash, one source rollup
  // — shuffle ∝ corpus rows, state ∝ sources. Exact integers;
  // savings as truncating ppm of the source's characters.
  def dedupSavings(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("text")).as("h"))
    val keep = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    docs.join(keep, "h")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("doc_id") =!= col("keep_id"), 1)).as("n_dupes"),
        sum("n_chars").as("chars_total"),
        coalesce(sum(when(col("doc_id") =!= col("keep_id"), col("n_chars"))),
          lit(0L)).as("chars_saved"))
      .withColumn("savings_ppm",
        expr("chars_saved * 1000000L DIV chars_total"))
      .orderBy("source")
  }

  private val oDedupSavings =
    """WITH k AS (
      |  SELECT md5(text) AS h, min(doc_id) AS keep_id
      |  FROM documents GROUP BY 1)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(*) FILTER (WHERE doc_id <> keep_id) AS BIGINT)
      |    AS n_dupes,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
      |  CAST(coalesce(sum(n_chars) FILTER (WHERE doc_id <> keep_id), 0)
      |    AS BIGINT) AS chars_saved,
      |  CAST(coalesce(sum(n_chars) FILTER (WHERE doc_id <> keep_id), 0)
      |    * 1000000 // sum(n_chars) AS BIGINT) AS savings_ppm
      |FROM documents JOIN k ON md5(text) = h
      |GROUP BY source ORDER BY source""".stripMargin

  // C94 (r9): per-source length-percentile report — the p50/p90/p99
  // document sizes a dataloader planner sizes batches and truncation
  // budgets from (C45's MAD trims outliers; this reports the
  // distribution shape per source). ONE percentile_disc aggregate
  // computes all three boundaries + min/max per source (the B67
  // boundary discipline — no per-source sort materializes rows),
  // hash agg to |sources| rows. Exact: percentile_disc returns an
  // actual stored value, identical both engines.
  def corpusLengthPercentiles(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"),
        // r14: p50/p90/p99 from ONE shared percentile buffer (see
        // graft.functions.Percentiles); results bit-identical.
        graft.functions.Percentiles
          .percentileDiscArray(col("n_chars"), Seq(0.5, 0.9, 0.99)).as("ps"),
        max("n_chars").as("max_chars"))
      .select(col("source"), col("n_docs"), col("min_chars"),
        expr("CAST(ps[0] AS BIGINT)").as("p50"),
        expr("CAST(ps[1] AS BIGINT)").as("p90"),
        expr("CAST(ps[2] AS BIGINT)").as("p99"),
        col("max_chars"))
      .orderBy("source")

  private val oCorpusLengthPercentiles =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  min(n_chars) AS min_chars,
      |  quantile_disc(n_chars, 0.5) AS p50,
      |  quantile_disc(n_chars, 0.9) AS p90,
      |  quantile_disc(n_chars, 0.99) AS p99,
      |  max(n_chars) AS max_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // C95 (r9): embedding hygiene screen — the pre-index sanity pass
  // every vector pipeline needs: per label, how many vectors are
  // zero-norm (cosine-undefined — they silently poison ANN indexes),
  // carry a non-finite component, or are mis-dimensioned, plus the
  // squared-norm distribution (p50/min/max). Norms are exported as
  // round(‖v‖²·10⁴) integers: both engines fold the f32 components
  // in index order through double accumulation — identical IEEE op
  // sequence — so the rounded fixed-point value is bit-stable (the
  // C5 margin discipline, with a 10⁻¹² boundary-flip exposure at
  // 1e-4 resolution). ONE codegen'd per-row projection (no explode),
  // hash agg to |labels| rows.
  def embedHygiene(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        expr("size(embedding)").cast("long").as("dims"),
        expr("CAST(round(aggregate(embedding, 0D, " +
          "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 10000D) " +
          "AS BIGINT)").as("norm2_e4"),
        expr("exists(embedding, x -> isnan(x))").as("bad"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        count(when(col("norm2_e4") === 0L, 1)).as("n_zero_norm"),
        count(when(col("bad"), 1)).as("n_nonfinite"),
        count(when(col("dims") =!= 64L, 1)).as("n_misdim"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY norm2_e4) AS BIGINT)")
          .as("p50_norm2_e4"),
        min("norm2_e4").as("min_norm2_e4"),
        max("norm2_e4").as("max_norm2_e4"))
      .orderBy("label")

  private val oEmbedHygiene =
    """WITH v AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CAST(len(embedding) AS BIGINT) AS dims,
      |    CAST(round(list_reduce(list_prepend(0.0,
      |      [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]),
      |      (a, b) -> a + b) * 10000) AS BIGINT) AS norm2_e4,
      |    len([x FOR x IN embedding IF isnan(CAST(x AS DOUBLE))]) > 0 AS bad
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(count(*) FILTER (WHERE norm2_e4 = 0) AS BIGINT) AS n_zero_norm,
      |  CAST(count(*) FILTER (WHERE bad) AS BIGINT) AS n_nonfinite,
      |  CAST(count(*) FILTER (WHERE dims <> 64) AS BIGINT) AS n_misdim,
      |  quantile_disc(norm2_e4, 0.5) AS p50_norm2_e4,
      |  min(norm2_e4) AS min_norm2_e4,
      |  max(norm2_e4) AS max_norm2_e4
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  // C96 (r9): dedup threshold sensitivity — pair counts and affected
  // docs at a LADDER of Jaccard thresholds from one truth
  // computation, the tuning evidence behind choosing C2's τ (too low
  // merges distinct docs, too high leaves near-dups; the report
  // shows where the cliff is). Reuses the session-cached capped
  // truth (τ=0.2 floor) — ONE O(cap²) pass shared with the recall
  // gates — then a 5-row ladder crossJoin + conditional agg; at
  // production scale the input would be C2's LSH pairs, same report
  // shape.
  def dedupThresholdSweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = jaccardTruthCached(s, d, 500, 0.2)
    val taus = Seq(200000L, 300000L, 420000L, 500000L, 700000L)
    val ladder = taus.map(t => (t, t / 1e6)).toDF("tau_ppm", "tau")
    pairs.crossJoin(broadcast(ladder))
      .filter(col("jaccard") >= col("tau"))
      .groupBy("tau_ppm")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id_b")).as("n_docs_dropped"))
      .orderBy("tau_ppm")
  }

  private val oDedupThresholdSweep =
    s"""${oJaccardTruth(500, 0.2)}
       |SELECT tau_ppm, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT id_b) AS BIGINT) AS n_docs_dropped
       |FROM truth, (SELECT unnest([200000, 300000, 420000, 500000,
       |  700000]) AS tau_ppm) t
       |WHERE jaccard >= tau_ppm / 1000000.0
       |GROUP BY tau_ppm ORDER BY tau_ppm""".stripMargin

  // C97 (r9): cross-lingual duplicate screen — exact-content pairs
  // whose two copies carry DIFFERENT language tags (copied/boiler-
  // plate text mislabeled by langid, or machine-translated spans
  // that survived verbatim — rows a per-language pipeline would
  // train twice): from C1's md5 groups, count pairs per unordered
  // (lang_a < lang_b) combination. Shapes: one md5+lang distinct
  // hash agg, one co-keyed self-join on the hash restricted to
  // lang_a < lang_b (pairs ∝ dup groups, never corpus²), rollup ∝
  // |lang pairs|.
  def dedupCrossLang(s: SparkSession, d: String): DataFrame = {
    // the clean synthetic corpus has no cross-language exact dups, so
    // the gate PLANTS them deterministically on both engines (the
    // C89/C98 fixture discipline): every ‰41 doc's text collapses to
    // one of 7 shared boilerplate strings while keeping its language
    // tag — guaranteed cross-lang groups, and a 0-row report can no
    // longer pass vacuously
    val docs = T.documents(s, d).select(
      when(col("doc_id") % 41 === 0,
        concat(lit("shared-boilerplate-"), (col("doc_id") % 7).cast("string")))
        .otherwise(col("text")).as("text"),
      col("lang"))
    val g = docs.select(md5(col("text")).as("h"), col("lang")).distinct()
    g.select(col("h"), col("lang").as("lang_a"))
      .join(g.select(col("h"), col("lang").as("lang_b")), "h")
      .filter(col("lang_a") < col("lang_b"))
      .groupBy("lang_a", "lang_b")
      .agg(count(lit(1)).as("n_shared_texts"))
      .orderBy("lang_a", "lang_b")
  }

  private val oDedupCrossLang =
    """WITH inj AS (
      |  SELECT CASE WHEN doc_id % 41 = 0
      |    THEN 'shared-boilerplate-' || CAST(doc_id % 7 AS VARCHAR)
      |    ELSE text END AS text, lang
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT md5(text) AS h, lang FROM inj)
      |SELECT a.lang AS lang_a, b.lang AS lang_b,
      |  CAST(count(*) AS BIGINT) AS n_shared_texts
      |FROM g a JOIN g b ON a.h = b.h AND a.lang < b.lang
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // C98 (r9): conversation turn-structure audit — the SFT-ingest
  // validation that rejects malformed transcripts BEFORE templating
  // (C61 renders, C85 masks; neither checks the role sequence):
  // must start with 'user', strictly alternate, end with
  // 'assistant'. The clean synthetic corpus gets transcripts BUILT
  // deterministically on both engines (2 + doc_id%4 turns) with
  // violations PLANTED at ‰13 (a doubled role at turn 1) and ‰17
  // (a truncated final user turn) — the C89 fixture discipline. The
  // audit itself is generic array logic: adjacent-equal count via a
  // zip of the list with its own tail, first/last element checks —
  // ONE codegen'd projection, hash agg to |sources| rows.
  def sftTurnAudit(s: SparkSession, d: String): DataFrame = {
    val roles = expr(
      """transform(sequence(0, CAST(1 + doc_id % 4 AS INT)),
        |  i -> CASE WHEN doc_id % 13 = 0 AND i = 1 THEN 'user'
        |            WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END)
        |""".stripMargin)
    val t = T.documents(s, d)
      .select(col("doc_id"), col("source"), roles.as("r"))
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 17 === 0,
          expr("slice(r, 1, size(r) - 1)")).otherwise(col("r")).as("roles"))
      .withColumn("n_turns", size(col("roles")).cast("long"))
      .withColumn("bad_start", col("roles")(0) =!= "user")
      .withColumn("bad_end",
        expr("element_at(roles, -1)") =!= "assistant")
      .withColumn("n_repeats", expr(
        """aggregate(zip_with(slice(roles, 1, size(roles) - 1),
          |  slice(roles, 2, size(roles) - 1), (a, b) -> CASE WHEN a = b
          |  THEN 1L ELSE 0L END), 0L, (acc, x) -> acc + x)""".stripMargin))
    t.groupBy("source")
      .agg(count(lit(1)).as("n_convs"),
        sum(expr("CAST(bad_start AS LONG)")).as("n_bad_start"),
        sum(expr("CAST(bad_end AS LONG)")).as("n_bad_end"),
        count(when(col("n_repeats") > 0L, 1)).as("n_bad_alternation"),
        sum("n_turns").as("turns_total"))
      .orderBy("source")
  }

  private val oSftTurnAudit =
    """WITH r0 AS (
      |  SELECT doc_id, source,
      |    [CASE WHEN doc_id % 13 = 0 AND i = 1 THEN 'user'
      |          WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
      |     FOR i IN range(0, CAST(2 + doc_id % 4 AS INT))] AS r
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 17 = 0 THEN r[1:len(r)-1] ELSE r END AS roles
      |  FROM r0),
      |a AS (
      |  SELECT source, CAST(len(roles) AS BIGINT) AS n_turns,
      |    roles[1] <> 'user' AS bad_start,
      |    roles[len(roles)] <> 'assistant' AS bad_end,
      |    len([i FOR i IN range(1, len(roles))
      |         IF roles[i] = roles[i + 1]]) AS n_repeats
      |  FROM t)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_convs,
      |  CAST(sum(CASE WHEN bad_start THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bad_start,
      |  CAST(sum(CASE WHEN bad_end THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bad_end,
      |  CAST(count(*) FILTER (WHERE n_repeats > 0) AS BIGINT)
      |    AS n_bad_alternation,
      |  CAST(sum(n_turns) AS BIGINT) AS turns_total
      |FROM a GROUP BY source ORDER BY source""".stripMargin

  // C99 (r9): shard-balance audit over the epoch manifest — the
  // pre-flight check that C58's seeded shard deal actually spreads
  // tokens evenly (a skewed shard = one slow data-parallel rank
  // every step of the epoch): per shard, doc and token totals plus
  // the signed ppm deviation from a perfectly even deal —
  // dev = tokens·shards·10⁶/total − 10⁶, one integer division on a
  // possibly-negative numerator (Spark DIV and DuckDB // both
  // truncate toward zero — verified, not assumed). Composition
  // gate: chains C58's
  // manifest (individually gated) into a |shards|-row rollup + one
  // 1-row total broadcast.
  def epochShardBalance(s: SparkSession, d: String): DataFrame = {
    val m = Packing.epochManifest(T.documents(s, d), col("doc_id"),
      size(split(col("text"), " ")).cast("long"),
      seed = "ep1", budget = 256L, shards = 4)
    val perShard = m.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("tokens"))
    perShard.crossJoin(broadcast(perShard.agg(sum("tokens").as("total"))))
      .select(col("shard"), col("n_docs"), col("tokens"),
        expr("(tokens * 4L * 1000000L - total * 1000000L) DIV total")
          .as("dev_ppm"))
      .orderBy("shard")
  }

  private val oEpochShardBalance =
    """WITH keyed AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    md5('ep1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |  FROM documents),
      |sharded AS (
      |  SELECT *, CAST(((instr('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1) * 16
      |    + instr('0123456789abcdef', substr(shuffle_key, 2, 1)) - 1) % 4 AS BIGINT)
      |    AS shard
      |  FROM keyed),
      |ps AS (
      |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(tokens) AS BIGINT) AS tokens
      |  FROM sharded GROUP BY 1),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM ps)
      |SELECT shard, n_docs, tokens,
      |  (tokens * 4 * 1000000 - total * 1000000) // total AS dev_ppm
      |FROM ps, t ORDER BY shard""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("epoch_shard_balance", epochShardBalance,
      Some(oEpochShardBalance)),
    QueryDef("dedup_cross_lang", dedupCrossLang, Some(oDedupCrossLang)),
    QueryDef("sft_turn_audit", sftTurnAudit, Some(oSftTurnAudit)),
    QueryDef("dedup_threshold_sweep", dedupThresholdSweep,
      Some(oDedupThresholdSweep)),
    QueryDef("embed_hygiene", embedHygiene, Some(oEmbedHygiene)),
    QueryDef("dedup_savings", dedupSavings, Some(oDedupSavings)),
    QueryDef("corpus_length_percentiles", corpusLengthPercentiles,
      Some(oCorpusLengthPercentiles)),
    QueryDef("sample_weighted", sampleWeighted, Some(oSampleWeighted)),
    QueryDef("text_compressibility", textCompressibility,
      Some(oTextCompressibility)),
    QueryDef("ann_centroid_assign", annCentroidAssign,
      Some(oAnnCentroidAssign)),
    QueryDef("dedup_edit_distance", dedupEditDistance, Some(oDedupEditDistance)),
    QueryDef("dedup_lsh_edit_verify", dedupLshEditVerify, Some(oDedupLshEditVerify)),
    QueryDef("text_template_leakage", textTemplateLeakage,
      Some(oTextTemplateLeakage)),
    QueryDef("graph_pagerank", graphPagerank, Some(oGraphPagerank)),
    QueryDef("graph_bfs_hops", graphBfsHops, Some(oGraphBfsHops)),
    QueryDef("multimodal_dims", multimodalDims, Some(oMultimodalDims)),
    QueryDef("multimodal_audio", multimodalAudio, Some(oMultimodalAudio)),
    QueryDef("multimodal_video", multimodalVideo, Some(oMultimodalVideo)),
    QueryDef("multimodal_frames", multimodalFrames, Some(oMultimodalFrames)),
    QueryDef("multimodal_audio_windows", multimodalAudioWindows,
      Some(oMultimodalAudioWindows)),
    QueryDef("multimodal_pcm", multimodalPcm, Some(oMultimodalPcm)),
    QueryDef("dedup_containment", dedupContainment, Some(oDedupContainment)),
    QueryDef("dedup_url", dedupUrl, Some(oDedupUrl)),
    QueryDef("eval_calibration", evalCalibration, Some(oEvalCalibration)),
    QueryDef("eval_classifier_pr", evalClassifierPr, Some(oEvalClassifierPr)),
    QueryDef("split_temporal", splitTemporalQ, Some(oSplitTemporal)),
    QueryDef("multimodal_image_dedup", multimodalImageDedup,
      Some(oMultimodalImageDedup)),
    QueryDef("dedup_exact", dedupExact, Some(oDedupExact)),
    QueryDef("dedup_minhash_lsh", dedupMinhashLsh, Some(oDedupMinhashLsh)),
    QueryDef("dedup_minhash_incremental", dedupMinhashIncremental,
      Some(oDedupMinhashIncremental)),
    QueryDef("dedup_simhash", dedupSimhash, Some(oDedupSimhash)),
    QueryDef("dedup_ngram_jaccard", dedupNgramJaccard, Some(oDedupNgramJaccard)),
    QueryDef("text_dup_spans", textDupSpans, Some(oTextDupSpans)),
    QueryDef("text_dup_span_frac", textDupSpanFrac, Some(oTextDupSpanFrac)),
    QueryDef("text_jaccard_pairs", textJaccardPairs, Some(oTextJaccardPairs)),
    QueryDef("dedup_embedding", dedupEmbedding, Some(oDedupEmbedding)),
    QueryDef("dedup_embedding_lsh", dedupEmbeddingLsh, Some(oDedupEmbedding)),
    QueryDef("dedup_clusters", dedupClusters, Some(oDedupClusters)),
    QueryDef("dedup_cluster_weights", dedupClusterWeights,
      Some(oDedupClusterWeights)),
    QueryDef("dedup_semantic_keep", dedupSemanticKeep, Some(oDedupSemanticKeep)),
    QueryDef("decontaminate_semantic", decontaminateSemantic, Some(oDecontaminateSemantic)),
    QueryDef("ann_cosine_topk", annCosineTopk, Some(oAnnCosineTopk)),
    QueryDef("ann_filtered", annFiltered, Some(oAnnFiltered)),
    QueryDef("ann_lsh", annLsh, Some(oAnnLsh)),
    QueryDef("ann_ivf", annIvf, Some(oAnnIvf)),
    QueryDef("ann_pq", annPq, Some(oAnnPq)),
    QueryDef("ann_ivf_pq", annIvfPq, Some(oAnnIvfPq)),
    QueryDef("text_langid", textLangid, Some(oTextLangid)),
    QueryDef("corpus_stats", corpusStats, Some(oCorpusStats)),
    QueryDef("corpus_filtered", corpusFiltered, Some(oCorpusFiltered)),
    QueryDef("pack_sequences", packSequences, Some(oPackSequences)),
    QueryDef("pack_texts", packTexts, Some(oPackTexts)),
    QueryDef("pack_chunks", packChunksQ, Some(oPackChunks)),
    QueryDef("pack_chunks_sliding", packChunksSlidingQ, Some(oPackChunksSliding)),
    QueryDef("text_scrub", textScrub, Some(oTextScrub)),
    QueryDef("text_boilerplate", textBoilerplate, Some(oTextBoilerplate)),
    QueryDef("split_assign", splitAssign, Some(oSplitAssign)),
    QueryDef("shuffle_deterministic", shuffleDeterministicQ, Some(oShuffleDeterministic)),
    QueryDef("text_quality", textQuality, Some(oTextQuality)),
    QueryDef("text_gopher_rules", textGopherRules, Some(oTextGopherRules)),
    QueryDef("text_readability", textReadability, Some(oTextReadability)),
    QueryDef("text_luhn_scrub", textLuhnScrub, Some(oTextLuhnScrub)),
    QueryDef("text_cross_source_overlap", textCrossSourceOverlap,
      Some(oTextCrossSourceOverlap)),
    QueryDef("text_repetition", textRepetition, Some(oTextRepetition)),
    QueryDef("text_decontaminate", textDecontaminate, Some(oTextDecontaminate)),
    QueryDef("text_decontaminate_bloom", textDecontaminateBloom, Some(oTextDecontaminate)),
    QueryDef("text_decontaminate_filtered", textDecontaminateFiltered, Some(oTextDecontaminateFiltered)),
    QueryDef("text_heavy_hitters", textHeavyHitters, Some(oTextHeavyHitters)),
    QueryDef("text_tokens", textTokens, Some(oTextTokens)),
    QueryDef("text_lm_score", textLmScore, Some(oTextLmScore)),
    QueryDef("lm_bigram_next", lmBigramNext, Some(oLmBigramNext)),
    QueryDef("vocab_growth", vocabGrowth, Some(oVocabGrowth)),
    QueryDef("lm_kneser_ney", lmKneserNey, Some(oLmKneserNey)),
    QueryDef("text_vocab_oov", textVocabOov, Some(oTextVocabOov)),
    QueryDef("text_bpe_pairs", textBpePairs, Some(oTextBpePairs)),
    QueryDef("text_bpe_merge", textBpeMerge, Some(oTextBpeMerge)),
    QueryDef("text_bpe_train", textBpeTrain, Some(oTextBpeTrain)),
    QueryDef("text_sentences", textSentences, Some(oTextSentences)),
    QueryDef("eval_langid_confusion", evalLangidConfusion,
      Some(oEvalLangidConfusion)),
    QueryDef("sft_loss_mask", sftLossMask, Some(oSftLossMask)),
    QueryDef("privacy_k_anon", privacyKAnon, Some(oPrivacyKAnon)),
    QueryDef("privacy_l_diversity", privacyLDiversity, Some(oPrivacyLDiversity)),
    QueryDef("privacy_t_closeness", privacyTCloseness, Some(oPrivacyTCloseness)),
    QueryDef("graph_components", graphComponents, Some(oGraphComponents)),
    QueryDef("graph_communities", graphCommunities, Some(oGraphCommunities)),
    QueryDef("eval_sample_diversity", evalSampleDiversity,
      Some(oEvalSampleDiversity)),
    QueryDef("eval_ngram_overlap", evalNgramOverlap, Some(oEvalNgramOverlap)),
    QueryDef("eval_ndcg", evalNdcg, Some(oEvalNdcg)),
    QueryDef("eval_auc_binned", evalAucBinned, Some(oEvalAucBinned)),
    QueryDef("eval_cohens_kappa", evalCohensKappa, Some(oEvalCohensKappa)),
    QueryDef("eval_fleiss_kappa", evalFleissKappa, Some(oEvalFleissKappa)),
    QueryDef("text_normalize", textNormalize, Some(oTextNormalize)),
    QueryDef("text_html_strip", textHtmlStrip, Some(oTextHtmlStrip)),
    QueryDef("text_mojibake", textMojibake, Some(oTextMojibake)),
    QueryDef("corpus_outliers", corpusOutliers, Some(oCorpusOutliers)),
    QueryDef("split_leakage_safe", splitLeakageSafeQ, Some(oSplitLeakageSafe)),
    QueryDef("text_tfidf_topk", textTfidfTopK, Some(oTextTfidf)),
    QueryDef("text_bm25_topk", textBm25, Some(oTextBm25)),
    QueryDef("mine_hard_negatives", mineHardNegatives, Some(oMineHardNegatives)),
    QueryDef("text_kn_ppl", textKnPpl, Some(oTextKnPpl)),
    QueryDef("corpus_kn_filtered", corpusKnFiltered, Some(oCorpusKnFiltered)),
    QueryDef("vocab_zipf", vocabZipf, Some(oVocabZipf)),
    QueryDef("lm_collocations", lmCollocations, Some(oLmCollocations)),
    QueryDef("term_burstiness", termBurstiness, Some(oTermBurstiness)),
    QueryDef("source_keyness", sourceKeyness, Some(oSourceKeyness)),
    QueryDef("eval_mrr", evalMrr, Some(oEvalMrr)),
    QueryDef("eval_bootstrap_ci", evalBootstrapCi, Some(oEvalBootstrapCi)),
    QueryDef("sample_exact_k", sampleExactK, Some(oSampleExactK)),
    QueryDef("mixture_waterfill", mixtureWaterfillQ, Some(oMixtureWaterfill)),
    QueryDef("eval_krippendorff", evalKrippendorff, Some(oEvalKrippendorff)),
    QueryDef("eval_rbo", evalRbo, Some(oEvalRbo)),
    QueryDef("text_lang_consistency", textLangConsistency,
      Some(oTextLangConsistency)),
    QueryDef("corpus_nb_classifier", corpusNbClassifier,
      Some(oCorpusNbClassifier)),
    QueryDef("corpus_nb_filtered", corpusNbFiltered,
      Some(oCorpusNbFiltered)),
    QueryDef("eval_nb_bootstrap", evalNbBootstrap,
      Some(oEvalNbBootstrap)),
    QueryDef("corpus_nb_holdout", corpusNbHoldout,
      Some(oCorpusNbHoldout)),
    QueryDef("eval_nb_holdout_ci", evalNbHoldoutCi,
      Some(oEvalNbHoldoutCi)),
    QueryDef("eval_nb_calibration", evalNbCalibration,
      Some(oEvalNbCalibration)),
    QueryDef("eval_nb_kfold", evalNbKfold, Some(oEvalNbKfold)),
    QueryDef("eval_nb_conformal", evalNbConformal,
      Some(oEvalNbConformal)),
    QueryDef("corpus_nb_features", corpusNbFeatures,
      Some(oCorpusNbFeatures)),
    QueryDef("embed_matryoshka_eval", embedMatryoshkaEval,
      Some(oEmbedMatryoshkaEval)),
    QueryDef("embed_quantize_binary", embedQuantizeBinary,
      Some(oEmbedQuantizeBinary)),
    QueryDef("ann_ivf_stats", annIvfStats, Some(oAnnIvfStats)),
    QueryDef("text_segment_langid", textSegmentLangid,
      Some(oTextSegmentLangid)),
    QueryDef("text_rrf_fusion", textRrfFusion, Some(oTextRrfFusion)),
    QueryDef("text_line_dedup", textLineDedup, Some(oTextLineDedup)),
    QueryDef("text_url_parse", textUrlParse, Some(oTextUrlParse)),
    QueryDef("text_domain_filter", textDomainFilter, Some(oTextDomainFilter)),
    QueryDef("pack_epoch_manifest", packEpochManifest, Some(oPackEpochManifest)),
    QueryDef("corpus_drift", corpusDrift, Some(oCorpusDrift)),
    QueryDef("corpus_pipeline_e2e", corpusPipelineE2e, Some(oCorpusPipelineE2e)),
    QueryDef("sft_format", sftFormat, Some(oSftFormat)),
    QueryDef("corpus_ngram_diversity", corpusNgramDiversity,
      Some(oCorpusNgramDiversity)),
    QueryDef("corpus_curriculum", corpusCurriculum, Some(oCurriculum)),
    QueryDef("corpus_quality_classifier", corpusQualityClassifier,
      Some(oQualityClassifier)),
    QueryDef("text_fingerprint", textFingerprint, Some(oTextFingerprint)),
    QueryDef("embed_quantize_int8", embedQuantizeInt8, Some(oEmbedQuantizeInt8)),
    QueryDef("pack_length_batches", packLengthBatches, Some(oPackLengthBatches)),
    QueryDef("sample_temperature", sampleTemperatureQ, Some(oSampleTemperature)),
    QueryDef("select_token_budget", selectTokenBudgetQ, Some(oSelectTokenBudget)),
    QueryDef("text_chunk", textChunk, Some(oTextChunk)),
    QueryDef("mixture_interleave", mixtureInterleaveQ, Some(oMixtureInterleave)),
    QueryDef("epoch_mix_interleave", epochMixInterleave,
      Some(oEpochMixInterleave)),
    QueryDef("epoch_positions", epochPositions, Some(oEpochPositions)),
    QueryDef("dpo_pairs", dpoPairs, Some(oDpoPairs)),
    QueryDef("text_fertility", textFertility, Some(oTextFertility)),
    QueryDef("text_hashed_features", textHashedFeatures,
      Some(oTextHashedFeatures)),
    QueryDef("text_importance", textImportance, Some(oTextImportance)),
    QueryDef("q_sessionize", qSessionize, Some(oSessionize)),
    QueryDef("q_concurrent_sessions", qConcurrentSessions,
      Some(oConcurrentSessions)),
    QueryDef("q_gap_fill", qGapFill, Some(oGapFill)),
    QueryDef("q_gap_interp", qGapInterp, Some(oGapInterp)),
    QueryDef("q_asof_join", qAsofJoin, Some(oAsofJoin)),
    QueryDef("q_asof_forward", qAsofForward, Some(oAsofForward)),
    QueryDef("q_interval_join", qIntervalJoin, Some(oIntervalJoin)),
    QueryDef("q_range_join", qRangeJoin, Some(oRangeJoin)),
    QueryDef("q_approx_distinct", qApproxDistinct, Some(oApproxDistinct)),
    QueryDef("q_hll_intersect", qHllIntersect, Some(oHllIntersect)),
    QueryDef("q_hll_incremental", qHllIncremental, Some(oHllIncremental)),
    QueryDef("q_quantile_incremental", qQuantileIncremental, Some(oQuantileIncremental)),
    QueryDef("sample_stratified", sampleStratifiedQ, Some(oSampleStratified)),
    QueryDef("sample_cluster_balanced", sampleClusterBalanced,
      Some(oSampleClusterBalanced)),
    QueryDef("sample_token_budget", sampleTokenBudgetQ, Some(oSampleTokenBudget)),
    QueryDef("sample_mixture", sampleMixtureQ, Some(oSampleMixture)),
    QueryDef("sample_mixture_upsample", sampleMixtureUpsampleQ, Some(oSampleMixtureUpsample)),
    QueryDef("q_approx_quantile", qApproxQuantile, Some(oApproxQuantile)),
    QueryDef("corpus_datacard", corpusDatacard, Some(oCorpusDatacard)),
    QueryDef("graph_triangles", graphTriangles, Some(oGraphTriangles)),
  )

  // C101 (r9): triangle counting + local clustering coefficient over
  // the same synthetic source-link graph the BFS/pagerank gates use —
  // the third classic distributed-graph primitive (community density
  // / spam-farm detection on a web-derived link graph). Edges
  // canonicalize undirected as (least, greatest) and dedup; each
  // triangle x<y<z is enumerated exactly once by two co-keyed joins
  // plus the closing-edge semi join — at scale this is the standard
  // 2-shuffle triangle join (no per-node adjacency materialization,
  // no driver graph), with the heavy-hitter mitigation being the
  // same degree-ordered canonicalization. Clustering coefficient is
  // integer ppm: 2·tri·10⁶ DIV (deg·(deg−1)).
  def graphTriangles(s: SparkSession, d: String): DataFrame = {
    val raw = T.documents(s, d).select(col("source").as("u"),
      concat(lit("src"), (col("doc_id") * 7 + 3) % 20).as("v"))
      .filter(col("u") =!= col("v"))
    val edges = raw.select(least(col("u"), col("v")).as("a"),
      greatest(col("u"), col("v")).as("b")).distinct()
    val deg = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"),
        "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("""CASE WHEN degree >= 2
               |  THEN coalesce(n_triangles, 0L) * 2000000 DIV (degree * (degree - 1))
               |  ELSE 0L END""".stripMargin).as("clustering_ppm"))
      .orderBy("node")
  }

  private lazy val oGraphTriangles =
    """WITH raw AS (
      |  SELECT source AS u,
      |    'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS v
      |  FROM documents),
      |e0 AS (
      |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      |  FROM raw WHERE u != v),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
      |    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) t GROUP BY 1),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e0 e1 JOIN e0 e2 ON e1.b = e2.a
      |  WHERE EXISTS (SELECT 1 FROM e0 e3
      |                WHERE e3.a = e1.a AND e3.b = e2.b)),
      |pn AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri) t GROUP BY 1)
      |SELECT deg.node, degree,
      |  CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
      |  CAST(CASE WHEN degree >= 2
      |    THEN coalesce(n_triangles, 0) * 2000000 // (degree * (degree - 1))
      |    ELSE 0 END AS BIGINT) AS clustering_ppm
      |FROM deg LEFT JOIN pn ON deg.node = pn.node
      |ORDER BY deg.node""".stripMargin

  // C100 (r9): the corpus DATACARD — the one-table-per-source report
  // a dataset release ships (HuggingFace dataset cards / Datasheets
  // for Datasets): volume (docs, chars, whitespace tokens), length
  // shape (mean via integer DIV, true median via percentile_disc),
  // language mix (count + modal language with min tie-break + its
  // ppm share), and exact-duplicate burden (md5 groups → dup ppm).
  // Three bounded aggregations over ONE scan each — per-source, per-
  // (source, lang), per-(source, text-hash) — joined on the tiny
  // source key; every derived number is integer arithmetic. The
  // composition surface: each ingredient is gated on its own
  // elsewhere (C10/C15/C94/C1), the datacard pins them ASSEMBLED.
  def corpusDatacard(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("source"), col("lang"), col("n_chars"), col("text"))
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("n_chars_total"),
      sum(size(TextAnalysis.tokens(col("text"))).cast("long")).as("n_tokens"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
        .as("p50_chars"))
      .withColumn("mean_chars", expr("n_chars_total DIV n_docs"))
    val langCounts = docs.groupBy("source", "lang").agg(count(lit(1)).as("n"))
    val wl = Window.partitionBy("source")
      .orderBy(col("n").desc, col("lang"))
    val langs = langCounts
      .withColumn("r", row_number().over(wl))
      .groupBy("source").agg(
        count(lit(1)).as("n_langs"),
        max(when(col("r") === 1, col("lang"))).as("top_lang"),
        max(when(col("r") === 1, col("n"))).as("top_lang_n"))
    val dups = docs.groupBy(col("source"), md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy("source").agg(sum(col("n") - 1).as("n_dup_docs"))
    base.join(langs, "source").join(dups, "source")
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        col("n_tokens"), col("mean_chars"), col("p50_chars"),
        col("n_langs"), col("top_lang"),
        expr("top_lang_n * 1000000 DIV n_docs").as("top_lang_ppm"),
        col("n_dup_docs"),
        expr("n_dup_docs * 1000000 DIV n_docs").as("dup_ppm"))
      .orderBy("source")
  }

  // lazy: declared below the defs list that captures it
  private lazy val oCorpusDatacard =
    """WITH base AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |    CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars
      |  FROM documents GROUP BY 1),
      |lc AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
      |langs AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
      |    max(CASE WHEN r = 1 THEN lang END) AS top_lang,
      |    max(CASE WHEN r = 1 THEN n END) AS top_lang_n
      |  FROM (SELECT *, row_number() OVER (PARTITION BY source
      |          ORDER BY n DESC, lang) AS r FROM lc) t GROUP BY 1),
      |dups AS (
      |  SELECT source, CAST(sum(n - 1) AS BIGINT) AS n_dup_docs FROM (
      |    SELECT source, md5(text) AS h, count(*) AS n
      |    FROM documents GROUP BY 1, 2) t GROUP BY 1)
      |SELECT base.source, n_docs, n_chars_total, n_tokens,
      |  n_chars_total // n_docs AS mean_chars, p50_chars,
      |  n_langs, top_lang,
      |  CAST(top_lang_n * 1000000 // n_docs AS BIGINT) AS top_lang_ppm,
      |  n_dup_docs,
      |  CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm
      |FROM base JOIN langs ON base.source = langs.source
      |JOIN dups ON base.source = dups.source
      |ORDER BY base.source""".stripMargin
}
