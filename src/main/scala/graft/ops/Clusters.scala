package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution (SURVEY.md §2 C13): near-dup pairs
  * from LSH+verify form an undirected graph; a dedup pipeline must
  * resolve each connected component to one canonical document (the
  * reference keeps MIN(doc_id) — same convention here).
  *
  * Components via iterative min-label propagation over the edge
  * list: each round every node takes the min label among itself and
  * its neighbors; fixpoint when no label changes. Rounds needed =
  * graph diameter — near-dup clusters are LSH near-cliques, so 2–4
  * rounds in practice (maxIter bounds adversarial chains). Each
  * round is one shuffle (join + groupBy on node id) over the EDGE
  * list only — never the corpus — and the driver sees only the
  * converged/changed counters, no collected data.
  *
  * At 100 TB: |edges| ≈ |near-dup pairs| ≪ |docs|; label state is
  * two longs per node in the pair graph. The alternating small-star/
  * large-star optimization (Kiveris et al., "Connected Components in
  * MapReduce") drops rounds to O(log d) — not needed at dedup
  * diameters.
  */
object Clusters {

  /** (id_a, id_b) undirected pairs → (id, cluster_id) with
    * cluster_id = min node id of the component. Only nodes that
    * appear in `pairs` are emitted (singleton docs are their own
    * trivial cluster and need no row).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst"))).cache()
    // localCheckpoint (not cache) each round: an iterative plan's
    // lineage otherwise grows exponentially — by ~20 rounds even
    // PLANNING the query blows the driver heap. Checkpointing pins
    // the round's result and restarts the lineage, which is the
    // standard shape for iterative Spark algorithms.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label among each node's neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select("id", "label")
      iter += 1
    }
    edges.unpersist()
    // Exhausting maxIter with labels still moving means the returned
    // assignment is WRONG (components not yet merged), not just slow —
    // fail loudly rather than hand back silently bad clusters
    // (ADVICE r2). Graph diameter bounds the rounds needed; raise
    // maxIter for pathological chain-shaped duplicate graphs.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          s"($changed labels still changing); raise maxIter")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** One keep/drop decision per clustered doc: canonical = min id of
    * its component (the doc a dedup pass retains).
    */
  def canonicalAssignment(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("cluster_id").as("canonical_id"),
        (col("id") === col("cluster_id")).as("is_canonical"))
}
