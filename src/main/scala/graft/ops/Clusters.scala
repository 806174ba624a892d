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
  * two longs per node in the pair graph. Two algorithms:
  * `connectedComponents` (min-label propagation, O(diameter) rounds
  * — the simple reference implementation) and
  * `connectedComponentsStar` (alternating large-star/small-star
  * contraction after Kiveris et al., "Connected Components in
  * MapReduce and Beyond" — O(log²) rounds independent of diameter,
  * the one that survives adversarial chain graphs). Near-dup
  * cluster graphs are LSH near-cliques (diameter 2–4), where
  * propagation's one-shuffle rounds win outright — measured 1.2 s
  * vs 3.5 s for star on the sf0.1 gate (star pays two shuffles plus
  * two exact convergence probes per round). So propagation is the
  * `canonicalAssignment` default (oracle-gated by `dedup_clusters`,
  * and it now throws rather than returning non-converged labels);
  * reach for the star variant when the pair graph's diameter is
  * unbounded (entity-resolution chains, citation graphs) — the spec
  * proves their outputs equal and runs star on a 600-node chain
  * propagation cannot finish.
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

  /** Star-contraction components: alternate large-star and
    * small-star rounds over the directed edge list until fixpoint —
    * O(log²) rounds regardless of graph diameter (label propagation
    * needs `diameter` rounds, which a 10k-node duplicate chain turns
    * into 10k shuffles). Each round is two hash-shuffles over the
    * edge list (a per-node min aggregation + a join back to re-point
    * edges) — no sorts, no collected adjacency lists, so a
    * billion-edge pair graph runs the same plan shape. Fixpoint =
    * the round changed nothing (exact exceptAll emptiness probe, not
    * a checksum). At fixpoint every surviving edge is (node,
    * component-min); output matches `connectedComponents`.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // large-star: u's smaller-or-self min m; re-point every LARGER
      // neighbor v > u at m (keeps small edges as-is)
      val sym = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val lMin = sym.groupBy("src")
        .agg(least(min(col("dst")), col("src")).as("m"))
      val large = sym.join(lMin, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      // small-star: edges oriented big→small; every node of the
      // star (including the center) points at the min
      val sMin = large.groupBy("src").agg(min(col("dst")).as("m"))
      val next = large.join(sMin, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(sMin.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(true)
      done = next.exceptAll(edges).limit(1).count() == 0 &&
        edges.exceptAll(next).limit(1).count() == 0
      edges = next
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // stars: (v, min) for every non-min node; add the roots themselves
    edges.select(col("src").as("id"), col("dst").as("cluster_id"))
      .unionByName(edges.select(col("dst").as("id"), col("dst").as("cluster_id")).distinct())
      .distinct()
  }

  /** One keep/drop decision per clustered doc: canonical = min id of
    * its component (the doc a dedup pass retains). Label propagation
    * by default — see the object doc for the measured tradeoff vs
    * `connectedComponentsStar`.
    */
  def canonicalAssignment(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("cluster_id").as("canonical_id"),
        (col("id") === col("cluster_id")).as("is_canonical"))
}
