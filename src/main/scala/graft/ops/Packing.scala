package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (SURVEY.md §2 C14): assign each document
  * to a fixed-token-budget training sequence, the step between a
  * cleaned corpus and an LLM data loader.
  *
  * Deterministic contract (identical in the DuckDB oracle): documents
  * are sharded by `pmod(doc_id, shards)`, ordered by doc_id within a
  * shard, and binned by EXCLUSIVE prefix sum — a doc starts in
  * sequence `floor(prefix_tokens / budget)` of its shard. A doc
  * whose tokens straddle a boundary stays in the sequence its start
  * falls in (streaming-fill packing); callers pre-split documents
  * longer than the budget. True first-fit bin packing is inherently
  * sequential — the prefix-sum form gives ≥ budget/(budget+maxDoc)
  * fill at one window pass, with no cross-shard coordination.
  *
  * Scale: one shuffle on shard, per-shard sort by doc_id — shards are
  * independent, so packing 100 TB is embarrassingly parallel and the
  * shard count (not the corpus) bounds any task's window state.
  */
object Packing {

  /** Deterministic train/val/test assignment (SURVEY.md §2 C18): a
    * multiplicative hash of the id picks a bucket in [0, 1000); the
    * split is a bucket-range cut, so membership is stable under
    * corpus growth and reproducible on any engine (the arithmetic is
    * overflow-free mod-prime, identical in the DuckDB oracle —
    * deliberately NOT a platform hash function).
    */
  def splitAssign(docs: DataFrame, idCol: Column, trainPermille: Int = 980,
      valPermille: Int = 10): DataFrame = {
    docs.withColumn("split_bucket", permilleBucket(idCol))
      .withColumn("split",
        when(col("split_bucket") < trainPermille, lit("train"))
          .when(col("split_bucket") < trainPermille + valPermille, lit("val"))
          .otherwise(lit("test")))
  }

  /** Leakage-safe split (C46): assign train/val/test by the near-dup
    * CLUSTER, not the document — the split boundary must never run
    * between two near-duplicates, or the eval set silently contains
    * paraphrases of training documents (the within-corpus twin of
    * decontamination; C24/C40 guard against external benchmarks, this
    * guards the corpus against its own split). Every doc's split
    * bucket is computed from its cluster representative id (the
    * connected-component min — C13); unclustered docs are their own
    * singleton representative, so their assignment is IDENTICAL to
    * plain [[splitAssign]] — adding dedup information only ever moves
    * clustered docs, never reshuffles the rest.
    *
    * `pairs` is any verified near-dup edge list (id_a, id_b) — n-gram
    * Jaccard, SimHash, embedding cosine. Scale shape: components over
    * the EDGE list only (∝ dup pairs, ≪ corpus), then ONE key join of
    * the cluster map back onto the corpus (AQE broadcasts it when
    * small) + the same codegen'd mod-prime bucket as every other
    * split/sample op — so leakage-safe splits compose with stratified
    * sampling and mixtures on unchanged membership arithmetic.
    */
  def splitLeakageSafe(docs: DataFrame, pairs: DataFrame,
      trainPermille: Int = 980, valPermille: Int = 10): DataFrame = {
    val canon = Clusters.canonicalAssignment(pairs)
      .select(col("doc_id"), col("canonical_id"))
    val withRep = docs.join(canon, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("canonical_id"), col("doc_id")))
      .drop("canonical_id")
    splitAssign(withRep, col("rep_id"), trainPermille, valPermille)
  }

  /** The split/sample bucket: overflow-free mod-prime hash of the id
    * onto [0, 1000) — shared by splitAssign and sampleStratified so
    * sampling and splitting stay consistent and engine-reproducible.
    */
  def permilleBucket(idCol: Column): Column = {
    val P = 1000000007L
    val M = 1000003L
    pmod(pmod(idCol.cast("long"), lit(P)) * lit(M), lit(P)) % lit(1000L)
  }

  /** Stratified downsampling (SURVEY.md §2 C20): keep a per-stratum
    * permille of rows, decided by the deterministic id bucket — the
    * corpus-rebalancing step (e.g. downsample over-represented
    * languages) with reproducible membership at any scale: a pure
    * filter, no shuffle, no RNG.
    */
  def sampleStratified(docs: DataFrame, strataCol: Column, idCol: Column,
      permilleByStratum: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, pm)) => when(strataCol === lit(stratum), lit(pm)).otherwise(acc)
    }
    docs.filter(permilleBucket(idCol) < rate)
  }

  /** Deterministic corpus shuffle (SURVEY.md §2 C34): a seeded,
    * engine-reproducible global permutation — the order an LLM data
    * loader consumes the corpus in each epoch. The sort key is
    * `md5("<seed>:<id>")` (bit-identical across engines, unlike
    * platform hash functions), so the same seed reproduces the epoch
    * order exactly, different seeds give independent permutations,
    * and membership-stable corpus growth only inserts rows into the
    * order without reshuffling the rest.
    *
    * Scale: ONE range-partitioned sort on a 32-hex key — Spark's
    * sampling range partitioner spreads it evenly (no single-task
    * bottleneck), and a training loader consumes partition files in
    * partition order. The id tiebreak makes the order total even
    * under (astronomically unlikely) digest collisions.
    */
  def shuffleDeterministic(docs: DataFrame, idCol: Column, seed: String): DataFrame =
    docs
      .withColumn("shuffle_key",
        md5(concat(lit(seed), lit(":"), idCol.cast("string"))))
      .orderBy(col("shuffle_key"), idCol)

  /** Quality-prioritized token-budget selection (SURVEY.md §2 C35):
    * keep the best documents whose cumulative token count fits a
    * global budget — the step that cuts a scored corpus down to a
    * target training-set size. The selection contract is exact and
    * engine-reproducible: order docs by (`prio` DESC, `id` ASC) and
    * keep every doc whose inclusive running token sum ≤ `budget`.
    *
    * Scale shape: a naive single `sum() OVER (ORDER BY …)` is one
    * task holding the whole corpus. Instead: (1) one hash aggregation
    * builds the per-priority token histogram (`prio` must be a
    * low-cardinality integer score, e.g. a permille bucket — the
    * histogram is ≤ |prio values| rows, collected driver-side like a
    * config); (2) the driver walks the histogram to find the boundary
    * priority p*: every doc with prio > p* is kept by a pure filter
    * (no shuffle), every doc with prio < p* is dropped by the same
    * filter, and only the SINGLE boundary bucket runs a windowed
    * prefix sum against the residual budget. Worst-case window state
    * is one priority bucket, not the corpus.
    */
  def selectTokenBudget(docs: DataFrame, prioName: String, tokensName: String,
      idName: String, budget: Long): DataFrame = {
    val hist = docs.groupBy(col(prioName)).agg(sum(col(tokensName)).as("t"))
      .collect().map { r =>
        // Row.getLong silently reads NULL as 0 — a null prio would be
        // binned at priority 0 and a null token sum would corrupt the
        // boundary walk. The documented contract (low-cardinality
        // integer prio, non-null tokens) is enforced loudly (ADVICE r7).
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"selectTokenBudget needs non-null $prioName and $tokensName " +
            s"(saw ${r.get(0)} -> ${r.get(1)}); filter or default them first")
        (r.getLong(0), r.getLong(1))
      }
      .sortBy { case (p, _) => -p }
    var cum = 0L
    var boundary: Option[(Long, Long)] = None // (p*, residual budget)
    hist.foreach { case (p, t) =>
      if (boundary.isEmpty && cum + t > budget) boundary = Some((p, budget - cum))
      cum += t
    }
    boundary match {
      case None => docs // whole corpus fits the budget
      case Some((pStar, rem)) =>
        val w = Window.partitionBy(col(prioName)).orderBy(col(idName))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val edge = docs.filter(col(prioName) === lit(pStar))
          .withColumn("_tb_cum", sum(col(tokensName)).over(w))
          .filter(col("_tb_cum") <= lit(rem)).drop("_tb_cum")
        docs.filter(col(prioName) > lit(pStar)).unionByName(edge)
    }
  }

  /** Domain-mixture resampling (SURVEY.md §2 C36): resample a corpus
    * toward target per-source token weights — the mixing step that
    * turns raw source availability into a declared training mix.
    * Contract (all overflow-free integer arithmetic, reproducible on
    * any engine): with `weights` W(s) (unlisted sources get
    * `defaultWeight`) over the sources PRESENT in the corpus,
    * per-source token demand is `targetTokens · W(s) div ΣW`, and the
    * keep rate is `min(1000, 1000·demand div avail(s))` permille —
    * a source with less material than its demand caps at keep-all
    * (upsampling is the caller's decision, not silent duplication).
    * Membership is decided by the shared [[permilleBucket]], so the
    * mix composes consistently with splits and stratified sampling.
    *
    * Scale shape: one hash aggregation for per-source availability
    * (rows = |sources|, collected driver-side like a config), then a
    * pure codegen'd filter on the scan — no shuffle touches the
    * corpus itself.
    */
  def sampleMixture(docs: DataFrame, sourceName: String, idName: String,
      tokensCol: Column, weights: Map[String, Long], defaultWeight: Long,
      targetTokens: Long): DataFrame = {
    val avail = docs.groupBy(col(sourceName)).agg(sum(tokensCol).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sumW = avail.map { case (s, _) => weights.getOrElse(s, defaultWeight) }.sum
    val rates: Map[String, Long] = avail.map { case (s, t) =>
      val demand = targetTokens * weights.getOrElse(s, defaultWeight) / sumW
      s -> math.min(1000L, if (t == 0L) 1000L else 1000L * demand / t)
    }.toMap
    // <=> (not ===) so a NULL source matches its own avail row and
    // gets its allocated rate instead of silently vanishing at
    // keep_rate 0 (ADVICE r7): a null source is a real partition of
    // the corpus, weighted via defaultWeight like any unlisted one.
    val rate = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(sourceName) <=> lit(s), lit(r)).otherwise(acc)
    }
    docs.withColumn("keep_rate", rate)
      .filter(permilleBucket(col(idName)) < col("keep_rate"))
  }

  /** Mixture resampling WITH upsampling (C49) — [[sampleMixture]]
    * caps an under-supplied source at keep-all; an epoch-building
    * pipeline instead DUPLICATES under-represented sources to hit the
    * target mixture (the standard practice for high-quality small
    * sources — wiki/books seen 2–5× per epoch). Each doc gets
    * `n_copies = rate div 1000` plus one more when its permille
    * bucket clears `rate mod 1000` — so for rates below 1000 the
    * kept set is EXACTLY [[sampleMixture]]'s (bucket < rate), and
    * above 1000 duplication is deterministic, source-fair, and
    * composes with splits on the same bucket arithmetic. Output rows
    * carry (`copy_idx` 1..n, `rate_permille`) so downstream packing
    * can interleave copies instead of clustering them.
    *
    * All-integer arithmetic (overflow-free for any realistic token
    * counts); one |sources|-row aggregate then a codegen'd projection
    * + explode over the per-row copy count — no corpus shuffle.
    */
  def sampleMixtureUpsample(docs: DataFrame, sourceName: String, idName: String,
      tokensCol: Column, weights: Map[String, Long], defaultWeight: Long,
      targetTokens: Long): DataFrame = {
    val avail = docs.groupBy(col(sourceName)).agg(sum(tokensCol).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sumW = avail.map { case (s, _) => weights.getOrElse(s, defaultWeight) }.sum
    val rates: Map[String, Long] = avail.map { case (s, t) =>
      val demand = targetTokens * weights.getOrElse(s, defaultWeight) / sumW
      s -> (if (t == 0L) 1000L else 1000L * demand / t)
    }.toMap
    val rate = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(sourceName) <=> lit(s), lit(r)).otherwise(acc)
    }
    docs.withColumn("rate_permille", rate)
      .withColumn("n_copies",
        expr("rate_permille div 1000") +
          when(permilleBucket(col(idName)) < col("rate_permille") % 1000, 1L)
            .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("*"), explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .drop("n_copies")
  }

  /** Split documents longer than `maxTokens` into consecutive chunks
    * (SURVEY.md §2 C14c) — the pre-pass [[packSequences]] declares as
    * the caller's job: afterwards every row fits a packing bin. Pure
    * per-row map work (explode over ceil(n/max) chunk indices, token
    * slicing on the corpus' space tokenization — no shuffle, no UDF),
    * so it holds at any corpus size. Chunk ids are deterministic:
    * (`doc_id`, `chunk_idx`) with the text reassembled from the token
    * slice, short docs pass through as chunk 0.
    */
  def splitLongDocs(docs: DataFrame, textName: String, idName: String,
      maxTokens: Int): DataFrame = {
    val toks = split(col(textName), " ")
    docs
      .withColumn("_n_chunks",
        greatest(lit(1L), ceil(size(toks) / lit(maxTokens.toDouble))).cast("long"))
      .select(col("*"),
        posexplode(sequence(lit(0L), col("_n_chunks") - 1)).as(Seq("chunk_idx", "_c")))
      .withColumn(textName,
        concat_ws(" ", slice(toks, (col("chunk_idx") * maxTokens + 1).cast("int"),
          lit(maxTokens))))
      .drop("_n_chunks", "_c")
  }

  /** Overlapping-window chunking (C41) — the embedding-pipeline twin
    * of [[splitLongDocs]]: windows of `winTokens` starting every
    * `strideTokens` (stride < window ⇒ consecutive chunks overlap by
    * window − stride tokens, the standard long-document embedding
    * setup so no boundary context is lost). Chunk i covers tokens
    * [i·stride, i·stride + window); the last window may be shorter;
    * docs at or under one window pass through as chunk 0. Same pure
    * per-row map shape as the disjoint splitter: explode over the
    * per-doc chunk count, token slicing, no shuffle, no UDF.
    */
  def slidingChunks(docs: DataFrame, textName: String, idName: String,
      winTokens: Int, strideTokens: Int): DataFrame = {
    require(winTokens > 0 && strideTokens > 0,
      s"window/stride must be positive: $winTokens/$strideTokens")
    require(strideTokens <= winTokens,
      s"stride $strideTokens > window $winTokens would skip tokens — use splitLongDocs")
    val toks = split(col(textName), " ")
    docs
      .withColumn("_n_chunks",
        (greatest(lit(0L),
          ceil((size(toks) - winTokens) / lit(strideTokens.toDouble)).cast("long"))
          + 1L))
      .select(col("*"),
        posexplode(sequence(lit(0L), col("_n_chunks") - 1)).as(Seq("chunk_idx", "_c")))
      .withColumn(textName,
        concat_ws(" ", slice(toks, (col("chunk_idx") * strideTokens + 1).cast("int"),
          lit(winTokens))))
      .drop("_n_chunks", "_c")
  }

  /** End-to-end training-epoch manifest (C58) — the composition a
    * dataloader actually consumes, built from the gated parts in one
    * operator: C34's seeded deterministic permutation assigns each
    * doc a shuffle key; the KEY's leading bytes route the doc to one
    * of `shards` (so shard membership is itself a seeded permutation
    * — different seeds re-deal the shards, same seed reproduces them
    * bit-for-bit on any engine); within each shard, docs pack into
    * `budget`-token bins by the C14 exclusive-prefix rule in
    * (shuffle_key, doc_id) order. Per row: shard, position in shard,
    * bin, token offset in bin.
    *
    * Scale shape: ONE window per shard over its own rows (the C14
    * embarrassingly-parallel shape — state ∝ shard, never corpus; at
    * 1000 executors each shard's prefix sum is an independent task
    * chain). No global sort: the only total order is per-shard. The
    * shard router is pure per-row arithmetic on the md5 hex (instr
    * on the first two nibbles — deliberately lowest-common-
    * denominator SQL so any engine reproduces the same deal).
    */
  def epochManifest(docs: DataFrame, idCol: Column, tokens: Column,
      seed: String, budget: Long, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 256, s"shards must be in [1,256]: $shards")
    val keyed = docs.select(idCol.as("doc_id"), tokens.as("tokens"))
      .withColumn("shuffle_key",
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(shuffle_key, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(shuffle_key, 2, 1))") - 1)
          .cast("long") % shards)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    keyed
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("shard"), col("pos_in_shard"), col("tokens"),
        expr(s"(cum - tokens) div ${budget}L").as("bin"),
        expr(s"(cum - tokens) - ((cum - tokens) div ${budget}L) * ${budget}L")
          .as("offset_in_bin"))
  }

  def packSequences(docs: DataFrame, tokens: Column, budget: Long,
      shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        tokens.as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("tokens"),
        expr(s"(cum - tokens) div ${budget}L").as("seq_in_shard"),
        expr(s"(cum - tokens) - ((cum - tokens) div ${budget}L) * ${budget}L")
          .as("offset_in_seq"))
  }

  /** Per-million deterministic bucket — [[permilleBucket]] at ppm
    * granularity, for sampling rates permille can't express (the
    * temperature sampler's rates). The multiplier is LARGE
    * (5.5e8, not permilleBucket's 1e6-scale M): sequential ids then
    * wrap the prime every ~2 steps, so even a 100-id window
    * equidistributes at ppm granularity — with a small multiplier the
    * pre-wrap sequence is an arithmetic progression with step
    * M mod 1e6 = 3 and a sequential-id corpus lands ENTIRELY under
    * any realistic rate (measured: decile spread 997–1002 per 1000
    * expected over 10k sequential ids). Overflow-free:
    * (P−1)·M ≈ 5.5e17 < 2^63.
    */
  def ppmBucket(idCol: Column): Column = {
    val P = 1000000007L
    val M = 554862419L
    pmod(pmod(idCol.cast("long"), lit(P)) * lit(M), lit(P)) % lit(1000000L)
  }

  /** Temperature-scaled mixture sampling (SURVEY.md §2 C70) — the
    * mT5/XLM-R α-sampling that rebalances a multilingual (or
    * multi-source) mix: sampled sizes follow p_g^α instead of the raw
    * p_g, so dominant groups are down-weighted without starving rare
    * ones. Realized as a per-row Bernoulli keep at group rate
    * (n_min / n_g)^(1−α) — the rarest group keeps everything, a group
    * k× larger keeps k^(α−1) of itself, giving sampled counts ∝ n^α.
    *
    * Exactness contract: the exponent is dyadic — `quarters`/4 with
    * quarters ∈ {1,2,3} (α = 3/4, 1/2, 1/4) — so the rate computes as
    * a COMPOSITION OF SQRT (x^(1/2)=sqrt, x^(1/4)=sqrt∘sqrt,
    * x^(3/4)=sqrt·sqrt∘sqrt). IEEE requires sqrt and multiply
    * correctly rounded, so the double is bit-identical on any engine
    * — unlike pow(), which libms round differently in the last ulp
    * and would flip floor(rate·1e6) at boundaries. The keep decision
    * is then integer: [[ppmBucket]](id) < floor(rate·1e6).
    *
    * Scale shape: ONE |groups|-row count agg (map-side combined)
    * broadcast back onto the scan + a codegen'd filter — no per-row
    * shuffle at any corpus size.
    */
  def sampleTemperature(docs: DataFrame, groupCol: Column, idCol: Column,
      quarters: Int): DataFrame = {
    require(quarters >= 1 && quarters <= 3,
      s"exponent must be 1..3 quarters (α = 3/4, 1/2, 1/4): $quarters")
    def dyadic(x: Column): Column = quarters match {
      case 2 => sqrt(x)
      case 1 => sqrt(sqrt(x))
      case 3 => sqrt(x) * sqrt(sqrt(x))
    }
    val counts = docs.groupBy(groupCol.as("__g"))
      .agg(count(lit(1)).as("n_group"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_group")).as("n_min"))))
      .withColumn("rate_ppm",
        floor(dyadic(col("n_min").cast("double") / col("n_group")) * 1e6)
          .cast("long"))
    docs.join(broadcast(rates), groupCol <=> col("__g"))
      .filter(ppmBucket(idCol) < col("rate_ppm"))
      .drop("__g")
  }

  /** Exact-k per-stratum sample (SURVEY.md §2 C129) — "give me
    * exactly k docs per language/source, deterministically": the
    * complement of C20's fraction-based downsample, for eval-set and
    * probe-set construction where the CONTRACT is a count, not a
    * rate. The draw is the C34-family multiplicative permutation at
    * full resolution (u = (id mod p)·c mod p, p = 10⁹+7 — a bijection
    * on [0, p), so distinct ids under p never tie; the id tiebreak
    * covers the rest), making membership engine-reproducible and
    * stable under corpus growth (new ids insert into the order
    * without reshuffling survivors).
    *
    * Scale shape: TopKByOrder — the bounded-buffer hash aggregate, so
    * each task ships ≤ k rows per stratum to the shuffle and NO
    * stratum ever sorts its full membership (the window form would
    * sort ∝ stratum size); posexplode reads the rank straight off the
    * buffer order, no rank window at all.
    */
  def sampleExactK(docs: DataFrame, strataCol: Column, idCol: Column,
      k: Int): DataFrame = {
    val P = 1000000007L
    val M = 554862419L
    val u = pmod(pmod(idCol.cast("long"), lit(P)) * lit(M), lit(P))
    docs.select(strataCol.as("stratum"), idCol.cast("long").as("doc_id"))
      .withColumn("u", u)
      .groupBy("stratum")
      .agg(graft.functions.TopKByOrder(struct(col("doc_id"), col("u")),
        -col("u"), col("doc_id"), k).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("stratum"), (col("pos") + 1).cast("long").as("rk"),
        col("r.doc_id").as("doc_id"), col("r.u").as("u"))
  }

  /** Water-filling token-budget allocation across sources (SURVEY.md
    * §2 C130) — the mixture-construction step that caps dominant
    * domains: find the level τ where funding every source up to
    * min(c_s, τ) exactly fits the budget, so small sources keep
    * everything and large ones are capped at a COMMON ceiling (the
    * max-min fair allocation; iterating "cap the biggest, recurse"
    * converges to the same τ). Exact integer form: with sources
    * ascending by (count, name) and prefix sums cum_k,
    * k* = max{k : cum_k + (n−k)·c_k ≤ B} (the k smallest are fully
    * fundable with everyone else at least at c_k), then
    * τ = (B − cum_k*) div (n − k*); the ≤ (n−k*) unallocated
    * remainder tokens from the floor are declared, not redistributed.
    * A budget ≥ the corpus funds everything (τ = ∞ branch).
    *
    * Scale shape: one per-source token agg (∝ corpus tokens,
    * partial-aggregable) down to a SOURCES-sized relation; the
    * rank/prefix window runs over those ≤ |sources| rows (bounded
    * domain — the C35 config-sized-state discipline), and the k*, τ
    * scalars broadcast back as a 1-row cross join.
    */
  def mixtureWaterfill(docs: DataFrame, sourceCol: Column, tokens: Column,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = docs.groupBy(sourceCol.as("source"))
      .agg(sum(tokens).as("n_toks"))
    val w = Window.orderBy(col("n_toks"), col("source"))
    val o = c.withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n_toks"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n"),
        sum(col("n_toks")).as("total"))))
    val star = o.filter(col("cum") + (col("n") - col("k")) * col("n_toks")
        <= lit(budget))
      .agg(coalesce(max(col("k")), lit(0L)).as("ks"),
        coalesce(max(when(col("cum") + (col("n") - col("k")) * col("n_toks")
          <= lit(budget), col("cum"))), lit(0L)).as("cks"))
    o.crossJoin(broadcast(star))
      .withColumn("tau",
        when(col("total") <= lit(budget), lit(null).cast("long"))
          .otherwise(expr(s"(${budget}L - cks) div (n - ks)")))
      .withColumn("alloc",
        when(col("tau").isNull || col("k") <= col("ks"), col("n_toks"))
          .otherwise(least(col("n_toks"), col("tau"))))
      .withColumn("alloc_ppm",
        when(col("tau").isNull || col("k") <= col("ks"), lit(1000000L))
          .otherwise(expr("least(n_toks, tau) * 1000000L div n_toks")))
      .select("source", "n_toks", "alloc", "alloc_ppm")
  }

  /** Stride-scheduled mixture interleave (SURVEY.md §2 C73) — the
    * deterministic weighted round-robin a data loader runs so an
    * epoch's sources are SPREAD through the stream instead of read in
    * blocks (block order = the batch distribution drifts per source
    * over the epoch; interleave = every training window sees the
    * declared mix). Classic stride scheduling: source s with weight
    * w_s emits its k-th item at virtual time (2k+1)/(2·w_s); sorting
    * all items by that time interleaves sources proportionally with
    * per-source prefix deviation ≤ 1 item from the ideal quota.
    *
    * Exactness: the virtual time is computed as the INTEGER
    * (2k+1)·10^12 div (2·w_s) — identical BIGINT on any engine, ties
    * broken by (source, k); the per-source emission order is the
    * seeded md5 shuffle (C34's portable order). Each source's weight
    * is its row count — the self-proportional epoch interleave;
    * compose with C70's temperature sampling first to interleave a
    * rebalanced mix.
    *
    * Scale shape: one |sources|-row count agg broadcast back, one
    * per-source window for k (partitioned — no global state), one
    * codegen'd key projection. The returned `stride_key` IS the
    * schedule: consumers range-partition/sort by it — the key is
    * ~uniform on [0, 10^12), so repartitionByRange balances without
    * any single-task global window. (Materializing a dense global
    * `pos` is a two-pass prefix-offset job the consumer rarely needs.)
    */
  def mixtureInterleave(docs: DataFrame, sourceCol: Column,
      idCol: Column, seed: String = "ilv"): DataFrame = {
    val base = docs.select(sourceCol.as("__src"), idCol.as("doc_id"))
    val perSrc = Window.partitionBy(col("__src"))
      .orderBy(md5(concat(col("doc_id").cast("string"), lit("#" + seed))),
        col("doc_id"))
    val counts = base.groupBy(col("__src")).agg(count(lit(1)).as("w"))
    base
      .withColumn("k", row_number().over(perSrc).cast("long") - 1L)
      .join(broadcast(counts), "__src")
      .withColumn("stride_key",
        expr("(2*k + 1) * 1000000000000L div (2 * w)"))
      .select(col("__src").as("source"), col("doc_id"), col("k"),
        col("w"), col("stride_key"))
  }

  /** Dense global positions WITHOUT a single-task window (SURVEY.md
    * §2 C74 — the scale path C73's interleave declares for consumers
    * that need a materialized 0..n−1 `pos`, e.g. writing an epoch
    * order column): the textbook `row_number() OVER (ORDER BY …)`
    * plans one WindowExec over ONE partition — the whole corpus
    * serialized through a single task. This is the classic two-pass
    * form instead:
    *
    *  1. range-repartition + sort within partitions on the total
    *     order (the parallel sort Spark already does for ORDER BY),
    *     eagerly checkpointed so both passes see ONE materialization;
    *  2. per-partition row counts → a |partitions|-row driver
    *     cumulative sum → broadcast exclusive offsets back;
    *  3. pos = partition offset + index within the partition, where
    *     the index comes from `monotonically_increasing_id`'s
    *     within-partition counter (consecutive from 0 per partition —
    *     pinned by the law spec, which fails loudly if the engine
    *     ever changes that contract) — so NO WindowExec appears
    *     anywhere in the plan.
    *
    * `order` must be a TOTAL order (include a tiebreak) for a
    * deterministic assignment. Cost: one shuffle + one checkpoint
    * write + a driver array of |partitions| longs — at 100 TB the
    * single-task window this replaces is not slower, it is dead.
    */
  def materializePositions(df: DataFrame, order: Seq[Column],
      partitions: Int = 0): DataFrame = {
    val np = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(np, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"), min(col("__mid")).as("mid0"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = parts.scanLeft((-1, 0L, 0L)) {
      case ((_, acc, _), (pid, cnt, mid0)) => (pid, acc + cnt, mid0)
    }.tail.zip(parts).map { case ((pid, cumEnd, mid0), (_, cnt, _)) =>
      (pid, cumEnd - cnt, mid0)
    }
    val offDf = df.sparkSession.createDataFrame(
      offsets.toSeq.map { case (p, off, m0) => (p, off, m0) })
      .toDF("__pid", "__off", "__mid0")
    sorted.join(broadcast(offDf), "__pid")
      .withColumn("pos", col("__off") + (col("__mid") - col("__mid0")))
      .drop("__pid", "__mid", "__off", "__mid0")
  }

  /** Token-budget corpus selection (SURVEY.md §2 C71) — "take the
    * best documents until the training budget is spent": rank by an
    * integer quality score, keep from the top until cumulative tokens
    * reach `budget`. The naïve form is ONE global sort + running sum
    * over the corpus — a single-task window at 100 TB. This is the
    * two-level form: bucket scores by `bucketWidth`, aggregate tokens
    * per bucket (|buckets| ≤ score-range/width rows — config-sized),
    * run the cumulative cut over THAT (tiny window), then resolve
    * only the one BOUNDARY bucket with a per-doc window confined to
    * its rows. Buckets above the cut keep everything with no window
    * at all; buckets below drop entirely at the filter.
    *
    * Greedy cut semantics (deterministic, integer-exact): docs order
    * by (score DESC, id) — a doc that would straddle the boundary is
    * dropped, as is everything after it in the boundary bucket.
    */
  def selectByTokenBudget(docs: DataFrame, idCol: Column, tokens: Column,
      score: Column, budget: Long, bucketWidth: Int): DataFrame = {
    require(budget > 0 && bucketWidth > 0)
    val base = docs.select(idCol.as("doc_id"), tokens.as("tokens"),
      score.as("score"), expr(s"${scoreBucketSql("score", bucketWidth)}").as("b"))
    val cumW = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = base.groupBy("b").agg(sum(col("tokens")).as("b_toks"))
      .withColumn("cum", sum(col("b_toks")).over(cumW))
    val docW = Window.partitionBy(col("b"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(buckets), Seq("b"))
      .filter(col("cum") - col("b_toks") < budget) // below-cut buckets drop
      .withColumn("kept",
        when(col("cum") <= budget, lit(true)) // whole bucket fits
          .otherwise( // boundary bucket: per-doc running cut
            sum(col("tokens")).over(docW) <= lit(budget) - (col("cum") - col("b_toks"))))
      .filter(col("kept"))
      .select(col("doc_id"), col("tokens"), col("score"), col("b"))
  }

  /** `floor(score / width)` as SQL text so Spark and the oracle share
    * the literal integer-division bucketing (scores may be negative:
    * `div` truncates toward zero in both engines — callers pass
    * non-negative scores to keep buckets monotone).
    */
  private def scoreBucketSql(col: String, width: Int): String =
    s"$col div $width"

  /** Length-bucketed batching (SURVEY.md §2 C67) — the
    * padding-minimization pass an inference/training data loader
    * runs: every batch pads its documents to the batch max, so
    * batching docs of SIMILAR length is what keeps the pad waste
    * near zero (random batching wastes ~40% of compute on pad
    * tokens for typical length distributions). Docs shard by
    * `doc_id % shards`, sort by (tokens, doc_id) WITHIN the shard,
    * and cut into fixed-size batches in that order.
    *
    * Scale shape: the only sort is per-shard inside a window — no
    * global ordering, so shards scale out independently; the
    * per-batch report is a hash agg on (shard, batch). All-integer
    * outputs (pad_waste = n_docs · max − sum is exact).
    */
  def lengthBucketedBatches(docs: DataFrame, tokens: Column,
      batchSize: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("tokens"), col("doc_id"))
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        tokens.as("tokens"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch", expr(s"cast((__rn - 1) div $batchSize as bigint)"))
      .groupBy(col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("tokens")).as("min_toks"),
        max(col("tokens")).as("max_toks"),
        sum(col("tokens")).as("sum_toks"))
      .withColumn("pad_waste", col("n_docs") * col("max_toks") - col("sum_toks"))
  }
}
