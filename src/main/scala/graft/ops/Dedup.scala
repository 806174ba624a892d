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

  /** Word w-shingles of the token array. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - lit(w - 1), lit(1))),
      i => array_join(slice(toks, i, lit(w)), " ")))
  }

  /** MinHash signature: element h is min over shingles of
    * xxhash64(h, shingle) — k independent permutations via the
    * seed-mixing first argument.
    */
  def minhashSignature(sh: Column, k: Int = 16): Column =
    transform(sequence(lit(0), lit(k - 1)),
      h => array_min(transform(sh, s => xxhash64(h, s))))

  /** (band, bucket) keys for LSH banding: b bands of r signature
    * rows; bucket = hash of the band's slice.
    */
  def lshBands(sig: Column, b: Int = 8, r: Int = 2): Column =
    transform(sequence(lit(0), lit(b - 1)),
      band => struct(band.as("band"),
        xxhash64(band, slice(sig, band * lit(r) + lit(1), lit(r)).cast("string")).as("bucket")))

  /** Candidate near-duplicate pairs from MinHash+LSH banding:
    * docs sharing any band bucket, deduped across bands.
    */
  def minhashCandidates(docs: DataFrame, text: Column = col("text"),
      k: Int = 16, b: Int = 8, r: Int = 2, maxBucket: Int = 100): DataFrame = {
    val keyed = docs
      .select(col("doc_id"), lshBands(minhashSignature(shingles(text), k), b, r).as("bands"))
      .select(col("doc_id"), explode(col("bands")).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val small = keyed
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("n") <= maxBucket).drop("n")
    val a = small.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val bdf = small.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    a.join(bdf, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Jaccard similarity of the two docs' shingle sets — the exact
    * verification pass over LSH candidates (candidates ≪ corpus², so
    * carrying the shingle arrays through the join is cheap).
    */
  def ngramJaccardVerify(candidates: DataFrame, docs: DataFrame,
      text: Column = col("text"), minJaccard: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(text).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over the token multiset: per bit, sum ±1 weighted
    * by each token hash's bit; sign → bit. Pure fold — one pass over
    * the tokens, no shuffle.
    */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val counts = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(shiftR(xxhash64(t), b.cast("int")).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
            .otherwise(lit(-1L))),
        (a, v) => a + v))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, b) => acc.bitwiseOR(
        when(element_at(counts, (b + lit(1)).cast("int")) > 0, shiftL(lit(1L), b.cast("int")))
          .otherwise(lit(0L))))
  }

  /** SimHash near-duplicate pairs: 4 bands of 16 bits as LSH on the
    * 64-bit fingerprint, then exact Hamming-distance verification
    * with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, text: Column = col("text"),
      maxHamming: Int = 10, maxBucket: Int = 100): DataFrame = {
    val sh = docs.select(col("doc_id"), simhash(text).as("sim"))
    val keyed = sh.select(col("doc_id"), col("sim"), posexplode(
        array((0 to 3).map(b =>
          shiftright(col("sim"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*)
      ).as(Seq("band", "bucket")))
    val small = keyed
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("n") <= maxBucket).drop("n")
    val a = small.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = small.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
