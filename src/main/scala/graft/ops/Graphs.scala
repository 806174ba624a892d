package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality (SURVEY.md §2 C75): the host-level
  * PageRank screen a web-corpus curation pipeline runs before any
  * text processing — crawl-quality work (RefinedWeb, CCNet lineage)
  * ranks registrable hosts by link centrality and uses the rank as a
  * keep/weight signal, because spam farms have text statistics a
  * per-document filter can't see but link profiles it can. The
  * reference has no graph surface; this is the standard power
  * iteration re-expressed as fixed-point BIGINT arithmetic so the
  * result is engine-exact (no float accumulation order in the
  * contract).
  *
  * Arithmetic contract (what the DuckDB oracle re-derives):
  *
  *  - ranks are scaled BIGINTs, `rank_0 = scale` (default 10^12);
  *  - a node's per-edge share is `(rank DIV outw) * weight` — the
  *    division FIRST, so the intermediate never exceeds the rank
  *    and a 10^12-scaled rank times a large edge multiplicity
  *    cannot overflow; truncating integer division is identical on
  *    the JVM and DuckDB for the non-negative values ranks are;
  *  - `rank_{k+1} = base + (dampNum * Σ shares) DIV dampDen` with
  *    `base = ((dampDen − dampNum) * scale) DIV dampDen` — damping
  *    kept rational (85/100), never a double.
  *
  * Scale shape (100 TB crawl): the EDGE list is the big input —
  * one hash agg over (src, dst) pairs builds weighted edges
  * (shuffle ∝ distinct host pairs, far below document count); each
  * iteration is one join of the |hosts|-row rank state onto the
  * edge list + one hash agg back to |hosts| rows — K fixed
  * iterations = K edge-sized shuffles, state two longs per host,
  * never anything per-document after the edge agg. Rank state is
  * `localCheckpoint`ed each round so the K-deep lineage never
  * re-executes and the per-round plan stays constant-size (the
  * standard iterative-algorithm discipline; on a cluster this is
  * `checkpoint` to reliable storage). Dangling mass (edges into
  * hosts that link out nowhere) is dropped, not redistributed — the
  * declared simplification; redistribution adds one |nodes|-row agg
  * per iteration with the same shapes.
  */
object Graphs {

  /** Fixed-iteration integer PageRank over a weighted edge list.
    *
    * @param edges columns `src: string, dst: string, weight: long`
    *              (weight ≥ 1; self-loops allowed but conventionally
    *              filtered by the caller)
    * @return one row per node: `node, rank` (scaled BIGINT)
    */
  def pageRankInt(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < num < den, got $dampNum/$dampDen")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outw = edges.groupBy("src").agg(sum("weight").as("outw"))
    // weight and out-weight are loop-invariant: join once, reuse K times.
    val linked = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("weight"), col("outw"))
      .localCheckpoint(true)
    val base = ((dampDen - dampNum) * scale) / dampDen
    var ranks = nodes.withColumn("rank", lit(scale)).localCheckpoint(true)
    var k = 0
    while (k < iters) {
      val contribs = ranks.join(linked, ranks("node") === linked("src"))
        .select(col("dst").as("node"),
          (expr("rank DIV outw") * col("weight")).as("share"))
        .groupBy("node").agg(sum("share").as("mass"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(mass, 0L)) DIV $dampDen"))
            .as("rank"))
        .localCheckpoint(true)
      k += 1
    }
    ranks
  }

  /** Multi-source BFS hop distances (SURVEY.md §2 C79): the
    * crawl-frontier / link-neighborhood query next to [[pageRankInt]]
    * — "how many hops is every host from the seed set", the signal
    * behind crawl-depth priors, spam-neighborhood quarantine
    * (everything ≤ k hops from a blocklisted seed), and
    * link-proximity features. Directed edges, unit hop cost.
    *
    * Classic distributed BFS, NOT Dijkstra state-per-edge: the state
    * is `visited` (node, dist) and the per-round work is ONE join of
    * the frontier onto the edge list + a distinct + an anti-join
    * against visited — shuffle ∝ edges leaving the frontier, never
    * the whole graph. Rounds are bounded by `maxHops` and exit early
    * when the frontier empties (`isEmpty` is a driver action on an
    * already-aggregated frame — the standard iterative-driver
    * discipline, same as [[pageRankInt]]'s fixed K). State is
    * `localCheckpoint`ed per round so lineage stays constant-size
    * (cluster form: reliable checkpoint). Unreached nodes are ABSENT
    * from the result by declaration (a left join against the node
    * universe reintroduces them with a sentinel if a dense output is
    * wanted — |nodes|-row work, caller's choice).
    *
    * BFS invariant the laws pin: a node's dist is the MINIMUM hop
    * count over all paths from any seed — the anti-join guarantees a
    * node is assigned in the first round that reaches it and never
    * reassigned.
    */
  /** Distributed min-label connected components over an UNDIRECTED
    * view of `edges` (string src/dst): labels start at the node id;
    * each round every node takes the min over itself + its
    * neighbors' labels — the standard large-graph CC shape (state ∝
    * nodes, one shuffle per round, `localCheckpoint` cuts the
    * iterative lineage exactly like [[bfsHops]]). Rounds are FIXED at
    * `iters` so the result is engine-replayable (an oracle can chain
    * the same k rounds); convergence needs rounds ≥ the diameter of
    * the label-propagation tree, so the caller exports/asserts the
    * returned `prev_label` stability instead of trusting it.
    */
  def connectedComponents(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    var lab = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var prev = lab
    for (_ <- 1 to iters) {
      prev = lab
      val nbr = und.join(lab, und("a") === lab("node"))
        .groupBy(und("b").as("node")).agg(min(col("label")).as("nl"))
      lab = lab.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
    }
    lab.join(prev.withColumnRenamed("label", "prev_label"), "node")
  }

  /** Synchronous label-propagation communities (LPA) over an
    * UNDIRECTED view of `edges` (string src/dst) — the
    * community-detection pass a corpus organizer runs where
    * [[connectedComponents]] is too coarse (one giant component) and
    * modularity solvers are too heavy: labels start at the node id;
    * each round EVERY node simultaneously adopts the most frequent
    * label among its NEIGHBORS (count DESC, label ASC — a total
    * order, so ties are deterministic and the fixed-round result is
    * engine-replayable; classic LPA breaks ties randomly, which no
    * cross-engine gate could pin). Rounds are FIXED at `iters`:
    * synchronous LPA can oscillate on bipartite-ish structure, so
    * the contract is "the labeling after k rounds", not convergence
    * — callers export `prev_label` stability alongside, as CC does.
    *
    * Scale shape: per round ONE edge⋈labels shuffle (∝ edges) into
    * two hash aggs — (node, label) counts, then the argmax via
    * min(struct(−count, label)) with map-side partials, no window;
    * state ∝ nodes, `localCheckpoint` cuts the iterative lineage
    * exactly like [[connectedComponents]]/[[bfsHops]].
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    var lab = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var prev = lab
    for (_ <- 1 to iters) {
      prev = lab
      lab = und.join(lab, und("a") === lab("node"))
        .groupBy(und("b").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(min(struct((-col("cnt")).as("negc"), col("label").as("label")))
          .as("top"))
        .select(col("node"), col("top.label").as("label"))
        .localCheckpoint(true)
    }
    lab.join(prev.withColumnRenamed("label", "prev_label"), "node")
  }

  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = visited.select("node")
    var k = 1
    var done = maxHops == 0
    while (!done) {
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(k.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select("node")
        k += 1
        if (k > maxHops) done = true
      }
    }
    visited
  }
}
