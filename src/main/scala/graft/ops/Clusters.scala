package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Duplicate-cluster resolution (SURVEY.md §2 C13): near-dup pairs
  * from LSH+verify form an undirected graph; a dedup pipeline must
  * resolve each connected component to one canonical document (the
  * reference keeps MIN(doc_id) — same convention here).
  *
  * Three physical strategies behind one result contract:
  *
  *  - **Driver union-find** (the `connectedComponents` fast path):
  *    when the edge list is integral-keyed and fits a documented
  *    bound, one collect + linear union-by-min resolves exactly —
  *    no rounds, no iteration limit, three Spark jobs total. The
  *    same known-size gating philosophy as a broadcast threshold.
  *  - **Min-label propagation** (the distributed fallback): each
  *    round every node takes the min label among itself and its
  *    neighbors; fixpoint when no label changes. Rounds needed =
  *    graph diameter (maxIter bounds adversarial chains); the seed
  *    is the one-hop min, so near-clique LSH graphs converge a full
  *    round early. Each round is one shuffle (join + groupBy on node
  *    id) over the EDGE list only — never the corpus — and the
  *    driver sees only the changed counter, no collected data.
  *  - **`connectedComponentsStar`**: alternating large-star/
  *    small-star contraction after Kiveris et al., "Connected
  *    Components in MapReduce and Beyond" — O(log²) rounds
  *    independent of diameter, for edge lists that are BOTH over
  *    the collect bound and deep-chained (entity-resolution chains,
  *    citation graphs). The spec proves all outputs equal.
  *
  * At 100 TB: |edges| ≈ |near-dup pairs| ≪ |docs|; label state is
  * two longs per node in the pair graph. `canonicalAssignment`
  * (oracle-gated by `dedup_clusters`) uses `connectedComponents`,
  * which throws rather than returning non-converged labels when the
  * distributed loop exhausts maxIter.
  */
object Clusters {

  /** Edge-count gate below which components resolve driver-side with
    * exact union-find instead of the iterative Spark loop — the same
    * known-size gating philosophy as a broadcast-join threshold. A
    * near-dup pair graph is ≪ the corpus (it holds only docs with at
    * least one duplicate), so small-to-mid dedup runs fit: ≤ 2^19
    * edges ≈ 8 MB collected, resolved in one collect + linear
    * union-find instead of diameter× (shuffle-join + checkpoint +
    * count) rounds — measured 2.0 s → 0.3 s on the sf0.1 gate's
    * 441-edge graph, and the win GROWS under a contended scheduler
    * (the r7 driver record charged 17 s to this loop's job
    * overhead). The bound is deliberately conservative: collect-side
    * row deserialization is the driver path's real cost, and a
    * StressBench A/B at 3M clique edges measured union-find 10.6 s
    * vs 4.7 s distributed — the crossover sits under a million
    * edges, so big graphs (the true 100 TB regime) take the
    * distributed loop.
    */
  val CollectEdgesThreshold: Long = 1L << 19

  /** (id_a, id_b) undirected pairs → (id, cluster_id) with
    * cluster_id = min node id of the component. Only nodes that
    * appear in `pairs` are emitted (singleton docs are their own
    * trivial cluster and need no row). Rows with a NULL id are
    * dropped — a null doc id cannot name a duplicate.
    *
    * Two physical strategies behind one contract (spec-proven
    * equal): integral-id graphs at or under `collectEdges` edges run
    * exact union-find on the driver (no iteration limit — deep
    * chains converge too); everything else runs the distributed
    * min-label loop, whose rounds scale with graph diameter and are
    * bounded by `maxIter`.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      collectEdges: Long = CollectEdgesThreshold): DataFrame = {
    val idType = pairs.schema("id_a").dataType
    val clean = pairs.filter(col("id_a").isNotNull && col("id_b").isNotNull)
    val fwd = clean.select(col("id_a").as("src"), col("id_b").as("dst"))
    val integral = idType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integral && collectEdges > 0) {
      val cached = fwd.cache()
      try {
        val n = cached.count()
        if (n <= collectEdges) unionFindLocal(cached, idType)
        else propagateLabels(cached, maxIter)
      } finally cached.unpersist()
    } else propagateLabels(fwd, maxIter)
  }

  /** Driver-side exact components for a bounded edge list: one
    * collect, union-by-min with path compression (root of every set
    * IS the component min, so no second pass), one createDataFrame
    * back out. Linear in |edges|; no convergence rounds at all.
    */
  private def unionFindLocal(fwd: DataFrame, idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = fwd.sparkSession
    import spark.implicits._
    val edges = fwd.select(col("src").cast(LongType), col("dst").cast(LongType))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(a: Long): Long = {
      var root = a
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var x = a
      while (x != root) { val nxt = parent(x); parent(x) = root; x = nxt }
      root
    }
    edges.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val out = parent.keys.toArray.sorted.map(id => (id, find(id)))
    spark.createDataset(out.toSeq)
      .select(col("_1").cast(idType).as("id"), col("_2").cast(idType).as("cluster_id"))
  }

  /** The distributed min-label propagation loop (the path the
    * driver-side gate falls back to for big or non-integral graphs).
    */
  private def propagateLabels(fwd: DataFrame, maxIter: Int): DataFrame = {
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst"))).cache()
    // localCheckpoint (not cache) each round: an iterative plan's
    // lineage otherwise grows exponentially — by ~20 rounds even
    // PLANNING the query blows the driver heap. Checkpointing pins
    // the round's result and restarts the lineage, which is the
    // standard shape for iterative Spark algorithms.
    //
    // Seed with the ONE-HOP minimum (min of self and direct
    // neighbors) instead of the identity label: same single shuffle
    // as the old distinct() seed, but LSH near-dup clusters are
    // near-cliques, so most components are already converged in the
    // seed and the loop finishes a full round earlier (r7 verdict #1).
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("label"))
      .localCheckpoint(true)
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
