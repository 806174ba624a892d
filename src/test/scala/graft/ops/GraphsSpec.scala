package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** Laws for the C75 link-graph centrality (Graphs.pageRankInt).
  * The driver gate (`graph_pagerank`) pins the full fixed-point
  * arithmetic against DuckDB; these specs pin the ALGEBRA on graphs
  * small enough to hand-compute.
  */
class GraphsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L
  private val Base = 150000000000L // ((100-85)*scale) DIV 100

  private def ranks(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] =
    Graphs.pageRankInt(edges.toDF("src", "dst", "weight"), iters)
      .as[(String, Long)].collect().toMap

  test("one iteration on A->B matches the hand computation") {
    // A emits its whole rank to B; A keeps only the base term.
    val r = ranks(Seq(("a", "b", 1L)), iters = 1)
    assert(r("a") === Base)
    assert(r("b") === Base + (85L * Scale) / 100L)
  }

  test("two iterations on A->B: B's second-round mass is A's base rank") {
    val r = ranks(Seq(("a", "b", 1L)), iters = 2)
    assert(r("a") === Base)
    assert(r("b") === Base + (85L * Base) / 100L)
  }

  test("a 2-cycle is symmetric and conserves scaled mass up to truncation") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 4)
    assert(r("a") === r("b"))
    // full mass recirculates: each node's fixpoint is base/(1-0.85) = scale,
    // minus integer-truncation loss (< 1 unit per DIV per round)
    assert(r("a") <= Scale && r("a") > Scale - 10L)
  }

  test("star graph: the center outranks every leaf and order is by in-weight") {
    val edges = Seq(("l1", "hub", 3L), ("l2", "hub", 1L), ("l3", "hub", 1L),
      ("hub", "l1", 1L))
    val r = ranks(edges, iters = 3)
    assert(Seq("l2", "l3").forall(l => r("hub") > r(l)))
    // l1 receives the hub's full emission; l2/l3 receive nothing
    assert(r("l1") > r("l2") && r("l2") === r("l3"))
  }

  test("edge weights steer mass: the heavier target gets the larger share") {
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L)), iters = 1)
    assert(r("b") > r("c"))
    // shares are (rank DIV outw) * weight: 3/4 and 1/4 of the emitted unit
    val unit = Scale / 4L
    assert(r("b") === Base + (85L * (3L * unit)) / 100L)
    assert(r("c") === Base + (85L * unit) / 100L)
  }

  test("a dangling sink absorbs mass but never emits (declared leak)") {
    val r = ranks(Seq(("a", "sink", 1L), ("sink2", "a", 1L)), iters = 2)
    // sink has no out-edges: present as a node, receives, total mass shrinks
    assert(r.keySet === Set("a", "sink", "sink2"))
    assert(r.values.sum < 3L * Scale)
    assert(r("sink") > Base)
  }

  test("ranks are invariant to the input partitioning") {
    val edges = (0L until 200L).map(i => (s"h${i % 23}", s"h${(i * 7 + 3) % 23}", 1L + i % 5))
      .filter { case (s, d, _) => s != d }
    val one = ranks(edges, iters = 3)
    val shuffled = Graphs.pageRankInt(
      scala.util.Random.shuffle(edges).toDF("src", "dst", "weight").repartition(7),
      iters = 3).as[(String, Long)].collect().toMap
    assert(one === shuffled)
  }

  private def bfs(edges: Seq[(String, String)], seeds: Seq[String],
      maxHops: Int): Map[String, Long] =
    Graphs.bfsHops(edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .as[(String, Long)].collect().toMap

  test("bfsHops: min-dist over all paths — a shortcut edge wins over the long path") {
    // a→b→c→d plus shortcut a→c: c is 1 hop, d is 2, never 2/3.
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c")
    assert(bfs(e, Seq("a"), 5) ===
      Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("bfsHops: multi-seed takes the nearest seed; unreachable nodes absent; directed") {
    // x→y→z, q→z; seeds x,q: z is 1 (via q) not 2. w isolated as a
    // SOURCE only (w→x) — never reached (edges are directed).
    val e = Seq("x" -> "y", "y" -> "z", "q" -> "z", "w" -> "x")
    val r = bfs(e, Seq("x", "q"), 5)
    assert(r === Map("x" -> 0L, "q" -> 0L, "y" -> 1L, "z" -> 1L))
    assert(!r.contains("w"))
  }

  test("bfsHops: maxHops truncates; hop 0 is just the seed set; cycles terminate") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    assert(bfs(e, Seq("a"), 1) === Map("a" -> 0L, "b" -> 1L))
    assert(bfs(e, Seq("a"), 0) === Map("a" -> 0L))
    // the 3-cycle does not loop forever; d found at 3
    assert(bfs(e, Seq("a"), 10) ===
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("labelPropagation: bridged cliques separate into two communities, hand-traced") {
    import spark.implicits._
    // two triangles a1a2a3 / b1b2b3 with one bridge a3-b1: LPA must
    // NOT collapse them into one community the way min-label CC does.
    // Hand trace of the deterministic (count DESC, label ASC) rounds:
    // after 4 synchronous rounds the a-clique sits at label a1, the
    // b-clique at a3 (the bridge node's id travels as the b-side
    // community NAME — distinctness is what matters), all stable.
    val e = Seq("a1" -> "a2", "a2" -> "a3", "a3" -> "a1",
      "b1" -> "b2", "b2" -> "b3", "b3" -> "b1", "a3" -> "b1")
      .toDF("src", "dst")
    val r = Graphs.labelPropagation(e, iters = 4)
      .as[(String, String, String)].collect()
      .map(x => x._1 -> ((x._2, x._2 == x._3))).toMap
    assert(r === Map(
      "a1" -> (("a1", true)), "a2" -> (("a1", true)), "a3" -> (("a1", true)),
      "b1" -> (("a3", true)), "b2" -> (("a3", true)), "b3" -> (("a3", true))))
    // CC over the same graph gives ONE component — the contrast LPA exists for
    val cc = Graphs.connectedComponents(e, iters = 6)
      .select("label").distinct().count()
    assert(cc === 1L)
  }
}
