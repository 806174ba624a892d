package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables => T}

/** Relational query surface (SURVEY.md §2 B-series): the query shapes
  * a warehouse-backed data platform serves. Declarative
  * DataFrame plans — Catalyst handles pushdown, column pruning, join
  * strategy (small dims broadcast), and AQE handles runtime re-plan.
  *
  * Determinism for the hash-compare oracle gate: money sums are
  * computed as exact integer cents — `sum(round(x*100))/100.0` — so
  * the result is independent of partitioning/accumulation order
  * (each per-row rounding is IEEE-deterministic; integer-valued
  * double addition is exact). See SURVEY.md §5.
  */
object Relational {

  /** sum(round(expr*100))/100.0 — order-independent money sum. */
  private def cents(e: Column): Column = sum(round(e * lit(100.0))) / lit(100.0)
  private val revExpr: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0)
  private def rev: Column = sum(round(revExpr)) / lit(100.0)

  // B1: scan + filter + project — predicate and column pruning reach
  // the parquet scan (PushedFilters / ReadSchema in .explain).
  def qFilterProject(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1996-01-01") && col("l_discount") > lit(0.05))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val oFilterProject =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // B2: TPC-H Q1 shape — multi-aggregate groupBy; partial (map-side)
  // aggregation collapses before the single shuffle.
  def q1Agg(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        cents(col("l_extendedprice")).as("sum_base_price"),
        rev.as("revenue"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val oQ1 =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(round(l_extendedprice*100))/100.0 AS sum_base_price,
      |  sum(round(l_extendedprice*(1.0-l_discount)*100.0))/100.0 AS revenue,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // B3: TPC-H Q3 shape — join + agg + deterministic top-k (ties
  // broken by key so LIMIT is stable across engines).
  def q3Topk(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d).filter(col("c_mktsegment") === lit("BUILDING"))
    val o = T.orders(s, d).filter(col("o_orderdate") < lit("1997-03-15"))
    val l = T.lineitem(s, d).filter(col("l_shipdate") > lit("1997-03-15"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(rev.as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val oQ3 =
    """SELECT o_orderkey,
      |  sum(round(l_extendedprice*(1.0-l_discount)*100.0))/100.0 AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM customer
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-03-15'
      |  AND l_shipdate  > TIMESTAMP '1997-03-15'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // B4: multi-join with broadcast dims (Q5 shape, star-join chain).
  def q5Multijoin(s: SparkSession, d: String): DataFrame = {
    val cust = T.customer(s, d)
    val ord = T.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li = T.lineitem(s, d)
    val sup = T.supplier(s, d)
    val nat = T.nation(s, d)
    val reg = T.region(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(rev.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val oQ5 =
    """SELECT r_name, n_name,
      |  sum(round(l_extendedprice*(1.0-l_discount)*100.0))/100.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // B5: window rank per group — full ORDER BY tiebreak keeps
  // row_number deterministic across engines.
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  private val oWindowRank =
    """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin

  // B19: top-k per group as a bounded hash aggregation — identical
  // result to the B5 window form (same oracle SQL), but the plan is
  // ObjectHashAggregate with map-side partial combine: each task
  // ships at most k rows per group, no partition-wide sort. Prices
  // have 2 decimals, so cents-as-long is an exact order key.
  def qTopkAgg(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKByOrder(
        struct(col("o_orderkey"), col("o_totalprice")),
        round(col("o_totalprice") * 100).cast("long"),
        col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rnk"),
        col("r.o_orderkey").as("o_orderkey"), col("r.o_totalprice").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))

  // B5b: ranking-function breadth — ntile/percent_rank/cume_dist over
  // a totally-ordered window (same IEEE division both engines, so
  // the fractions hash-match exactly). Output thinned to 1% of rows.
  def qWindowStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    T.orders(s, d)
      .withColumn("q4", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("q4"), col("pr"), col("cd"))
      .orderBy(col("o_orderkey"))
  }

  private val oWindowStats =
    """SELECT o_orderkey, o_orderpriority, q4, pr, cd FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    ntile(4) OVER w AS q4,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)) t
      |WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin

  // B6: semi/anti join — EXISTS and NOT EXISTS as left_semi/left_anti
  // (no row multiplication, no dedup shuffle).
  def qSemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d)
    val o = T.orders(s, d).select(col("o_custkey"))
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    withO.unionByName(without).orderBy(col("kind"))
  }

  private val oSemiAnti =
    """SELECT kind, n FROM (
      |  SELECT 'with_orders' AS kind, count(*) AS n FROM customer
      |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |  UNION ALL
      |  SELECT 'without_orders' AS kind, count(*) AS n FROM customer
      |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) t
      |ORDER BY kind""".stripMargin

  // B7: distinct aggregation (exact; Spark plans expand+two-phase agg).
  def qDistinct(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  private val oDistinct =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // B8: rollup aggregation (grouping sets in one pass).
  def qRollup(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))

  private val oRollup =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // B8b: CUBE with grouping id — all 4 grouping sets in one pass,
  // with grouping() flags distinguishing real NULLs from subtotals.
  def qCube(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("g_rf").cast("int").as("g_rf"), col("g_ls").cast("int").as("g_ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"), col("g_rf"), col("g_ls"))

  private val oCube =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls, g_rf, g_ls""".stripMargin

  // B8c (r3): arbitrary GROUPING SETS — the general form rollup/cube
  // specialize ((rf, ls), (ls), ()): Catalyst expands the sets into
  // one Expand + hash aggregate, same single-pass plan as cube, not
  // one scan per set.
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("g_rf").cast("int").as("g_rf"), col("g_ls").cast("int").as("g_ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"), col("g_rf"), col("g_ls"))

  private val oGroupingSets =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY rf, ls, g_rf, g_ls""".stripMargin

  // B9: tumbling time-window aggregation over the event stream table
  // (batch shape of the Structured Streaming windowed agg). `ts` is
  // bigint nanos (see Verify session config); µs truncation matches
  // DuckDB's TIMESTAMP(NANOS)→TIMESTAMP read.
  def qEventWindows(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(
        date_format(date_trunc("day", timestamp_micros(expr("ts div 1000"))), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), cents(col("value")).as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  private val oEventWindows =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
      |  count(*) AS n, sum(round(value*100))/100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // B9b (r3): SLIDING time windows — size 2 days, slide 1 day, so
  // every event feeds exactly two windows. Catalyst expands the
  // overlap factor (size/slide) inline before one hash aggregation —
  // no self-union, no window function; the oracle re-derives the
  // same two aligned starts per event with integer µs arithmetic
  // (Spark's window origin is the epoch).
  def qSlidingWindows(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(
        window(timestamp_micros(expr("ts div 1000")), "2 days", "1 day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), cents(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("ws_us"), col("event_type"))

  private val oSlidingWindows =
    """SELECT (epoch_us(ts) // 86400000000 - k) * 86400000000 AS ws_us,
      |  event_type, count(*) AS n, sum(round(value*100))/100.0 AS sum_value
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) grid
      |GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin

  // B10: JSON extraction over event props (codegen'd path, no UDF).
  def qJsonExtract(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy((col("k") % 10).as("kmod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("kmod"))

  private val oJsonExtract =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY kmod""".stripMargin

  // B11: pivot / conditional aggregation (counts per event type as
  // columns). Pivot values are fixed so the schema is deterministic;
  // empty cells are coalesced to 0 to match FILTER-aggregation.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  def qPivot(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", EventTypes)
      .count()
      .select(col("bucket") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("bucket"))

  private val oPivot = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (event_type = '$t') AS $t").mkString(", ")
    s"""SELECT user_id % 10 AS bucket, $cols
       |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  // B12: set operations (INTERSECT / EXCEPT are distinct-set ops in
  // both engines).
  def qSetops(s: SparkSession, d: String): DataFrame = {
    val withOrders = T.orders(s, d).select(col("o_custkey").as("key")).distinct()
    val building = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
    withOrders.intersect(building).select(lit("both").as("kind"), col("key"))
      .unionByName(withOrders.except(building).select(lit("orders_only").as("kind"), col("key")))
      .orderBy(col("kind"), col("key"))
  }

  private val oSetops =
    """SELECT kind, key FROM (
      |  SELECT 'both' AS kind, key FROM (
      |    SELECT DISTINCT o_custkey AS key FROM orders
      |    INTERSECT
      |    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING') a
      |  UNION ALL
      |  SELECT 'orders_only' AS kind, key FROM (
      |    SELECT DISTINCT o_custkey AS key FROM orders
      |    EXCEPT
      |    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING') b) t
      |ORDER BY kind, key""".stripMargin

  // B21: multiset set operations — INTERSECT ALL / EXCEPT ALL keep
  // duplicates (bag semantics), unlike B12's distinct-set forms.
  def qSetopsAll(s: SparkSession, d: String): DataFrame = {
    val a = T.orders(s, d).select(col("o_custkey").as("key")) // dups preserved
    val b = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
    a.intersectAll(b).select(lit("both").as("kind"), col("key"))
      .unionByName(a.exceptAll(b).select(lit("orders_only").as("kind"), col("key")))
      .orderBy(col("kind"), col("key"))
  }

  private val oSetopsAll =
    """SELECT kind, key FROM (
      |  SELECT 'both' AS kind, key FROM (
      |    SELECT o_custkey AS key FROM orders
      |    INTERSECT ALL
      |    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING') a
      |  UNION ALL
      |  SELECT 'orders_only' AS kind, key FROM (
      |    SELECT o_custkey AS key FROM orders
      |    EXCEPT ALL
      |    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING') b) t
      |ORDER BY kind, key""".stripMargin

  // B22: NULL semantics — aggregate NULL skipping, the NULL group,
  // and null-safe (<=>) vs plain equality joins, pinned against the
  // oracle (IS NOT DISTINCT FROM) because engines diverge here.
  def qNullSemantics(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d).select(
      when(col("user_id") % 7 === 0, lit(null).cast("bigint"))
        .otherwise(col("user_id") % 7).as("nk"))
    val counts = e.agg(
      count(lit(1)).as("n_rows"),
      count(col("nk")).as("n_nonnull"),
      countDistinct(col("nk")).as("n_distinct"))
    val nGroups = e.groupBy("nk").count()
      .agg(count(lit(1)).as("n_groups"))
    val vals = e.distinct()
    val nullsafe = vals.as("l").join(vals.as("r"),
      col("l.nk") <=> col("r.nk")).agg(count(lit(1)).as("nullsafe_pairs"))
    val plain = vals.as("l").join(vals.as("r"),
      col("l.nk") === col("r.nk")).agg(count(lit(1)).as("plain_pairs"))
    counts.crossJoin(nGroups).crossJoin(nullsafe).crossJoin(plain)
  }

  private val oNullSemantics =
    """WITH e AS (SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 7 END AS nk
      |           FROM events),
      |v AS (SELECT DISTINCT nk FROM e)
      |SELECT
      |  (SELECT count(*) FROM e) AS n_rows,
      |  (SELECT count(nk) FROM e) AS n_nonnull,
      |  (SELECT count(DISTINCT nk) FROM e) AS n_distinct,
      |  (SELECT count(*) FROM (SELECT nk FROM e GROUP BY nk) g) AS n_groups,
      |  (SELECT count(*) FROM v l JOIN v r ON l.nk IS NOT DISTINCT FROM r.nk) AS nullsafe_pairs,
      |  (SELECT count(*) FROM v l JOIN v r ON l.nk = r.nk) AS plain_pairs""".stripMargin

  // B13: median over exact integer cents — both engines do exact
  // float64 arithmetic on integers ±.5, so the interpolated middle
  // is bit-identical despite different interpolation formulas.
  def qMedian(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(median(round(col("o_totalprice") * 100)).as("median_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val oMedian =
    """SELECT o_orderpriority, median(round(o_totalprice * 100)) AS median_cents,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // B58 (r9): mode + discrete percentiles — the "most frequent value"
  // and "actual-element quantile" aggregate surface. mode uses the
  // DETERMINISTIC tie-break (lowest value wins), so the export is
  // engine-exact even on tied frequencies; percentile_disc is the SQL
  // standard (first value whose cume_dist ≥ q) and returns a real
  // data element, never an interpolation — the oracle re-derives both
  // from first principles (count-argmax with min tie-break;
  // cume_dist threshold) rather than trusting DuckDB's own
  // tie/quantile conventions. One hash agg + one sort-agg pass.
  def qModeDisc(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        mode(col("l_linestatus"), deterministic = true).as("mode_ls"),
        mode(round(col("l_quantity")).cast("long"), deterministic = true)
          .as("mode_qty"),
        // r14: q25/q50/q75 from ONE shared percentile buffer (see
        // graft.functions.Percentiles); results bit-identical.
        graft.functions.Percentiles
          .percentileDiscArray(col("l_quantity"), Seq(0.25, 0.5, 0.75))
          .as("qs"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("mode_ls"), col("mode_qty"),
        expr("CAST(qs[0] AS DOUBLE)").as("q25"),
        expr("CAST(qs[1] AS DOUBLE)").as("q50"),
        expr("CAST(qs[2] AS DOUBLE)").as("q75"),
        col("n"))
      .orderBy(col("l_returnflag"))

  private val oModeDisc =
    """WITH cs AS (SELECT l_returnflag, l_linestatus, count(*) AS n
      |            FROM lineitem GROUP BY 1, 2),
      |ms AS (SELECT l_returnflag, min(l_linestatus) AS mode_ls FROM (
      |  SELECT l_returnflag, l_linestatus, n,
      |    max(n) OVER (PARTITION BY l_returnflag) AS mx FROM cs) t
      |  WHERE n = mx GROUP BY 1),
      |cq AS (SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qv,
      |    count(*) AS n FROM lineitem GROUP BY 1, 2),
      |mq AS (SELECT l_returnflag, min(qv) AS mode_qty FROM (
      |  SELECT l_returnflag, qv, n,
      |    max(n) OVER (PARTITION BY l_returnflag) AS mx FROM cq) t
      |  WHERE n = mx GROUP BY 1),
      |cd AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
      |    cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS c
      |  FROM lineitem),
      |pd AS (SELECT l_returnflag,
      |    min(CASE WHEN c >= 0.25 THEN v END) AS q25,
      |    min(CASE WHEN c >= 0.5  THEN v END) AS q50,
      |    min(CASE WHEN c >= 0.75 THEN v END) AS q75,
      |    count(*) AS n
      |  FROM cd GROUP BY 1)
      |SELECT l_returnflag, mode_ls, mode_qty, q25, q50, q75, n
      |FROM ms JOIN mq USING (l_returnflag) JOIN pd USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // B23 (r4): LATERAL-style explode with ordinality (LATERAL VIEW
  // posexplode ≙ UNNEST WITH ORDINALITY) — the array-to-rows surface.
  // split+posexplode stay in one WholeStageCodegen span; the only
  // exchange is the presentation sort.
  def qExplodeOrdinality(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
      .orderBy(col("doc_id"), col("pos"))

  private val oExplodeOrdinality =
    """SELECT doc_id,
      |  unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
      |  unnest(string_split(text, ' ')) AS tok
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos""".stripMargin

  // B24 (r4): RANGE-framed running window — trailing 7-day cents sum
  // per user ordered by event time. The frame is a VALUE range
  // (ties/gaps resolved by the frame spec, so the result is
  // deterministic under equal timestamps, unlike a ROWS frame);
  // exact integer cents keep the running sum hash-stable.
  def qRangeWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-604800000000L, 0L)
    T.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        round(col("value") * lit(100.0)).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        sum(col("cents")).over(w).as("run_cents"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  private val oRangeWindow =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
      |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin

  // B25 (r5): window navigation — lag/lead/first_value/last_value,
  // the offset family B5/B5b's ranking functions don't cover. Full
  // ORDER BY tiebreak (price, key) keeps every offset deterministic;
  // last_value needs the explicit whole-partition ROWS frame in both
  // engines (the default frame stops at CURRENT ROW). One window =
  // one Exchange + one in-partition sort; output thinned to 1%.
  def qLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.orders(s, d)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .withColumn("last_key", last(col("o_orderkey")).over(wFull))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("prev_price"),
        col("next_key"), col("first_key"), col("last_key"))
      .orderBy(col("o_orderkey"))
  }

  private val oLagLead =
    """SELECT o_orderkey, o_orderpriority, prev_price, next_key, first_key, last_key FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    lag(o_totalprice) OVER w AS prev_price,
      |    lead(o_orderkey) OVER w AS next_key,
      |    first_value(o_orderkey) OVER w AS first_key,
      |    last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)) t
      |WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin

  // B26 (r5): UNPIVOT / melt — wide per-priority measures back to
  // (priority, measure, value) long form via stack(), the inverse of
  // B11's pivot. Measures are derived from exact integer cents so the
  // doubles hash-match; stack() is a codegen'd Generate (one pass, no
  // shuffle beyond the aggregation that built the wide row).
  // B28: aggregate FILTER clauses — several conditionally-filtered
  // aggregates in ONE grouping pass (the reporting idiom `count(*)
  // FILTER (WHERE …)`); Spark expresses each as agg(when(cond, …)),
  // which stays a single hash aggregation over one scan — never N
  // scans or a self-join per condition. Money stays exact via the
  // cents idiom.
  def qAggFilter(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_all"),
        count(when(col("o_totalprice") > 150000.0, lit(1))).as("n_big"),
        count(when(col("o_orderstatus") === "F", lit(1))).as("n_finished"),
        (sum(when(col("o_orderstatus") === "F",
            round(col("o_totalprice") * lit(100.0)))) / lit(100.0))
          .as("sum_finished"),
        max(when(col("o_orderstatus") =!= "F", col("o_orderkey"))).as("max_open_key"))
      .orderBy(col("o_orderpriority"))

  private val oAggFilter =
    """SELECT o_orderpriority,
      |  count(*) AS n_all,
      |  count(*) FILTER (o_totalprice > 150000.0) AS n_big,
      |  count(*) FILTER (o_orderstatus = 'F') AS n_finished,
      |  sum(round(o_totalprice*100)) FILTER (o_orderstatus = 'F')/100.0
      |    AS sum_finished,
      |  max(o_orderkey) FILTER (o_orderstatus != 'F') AS max_open_key
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def qUnpivot(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("n_orders"), sum(cents).as("sum_cents"))
      .select(col("o_orderpriority"), col("n_orders"),
        (col("sum_cents") / 100.0).as("sum_price"),
        round(col("sum_cents") / (lit(100.0) * col("n_orders")), 6).as("avg_price"))
      .selectExpr("o_orderpriority",
        "stack(3, 'n_orders', n_orders, 'sum_price', sum_price, 'avg_price', avg_price) AS (measure, value)")
      .orderBy(col("o_orderpriority"), col("measure"))
  }

  private val oUnpivot =
    """WITH wide AS (
      |  SELECT o_orderpriority,
      |    CAST(count(*) AS DOUBLE) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM orders GROUP BY 1),
      |w2 AS (
      |  SELECT o_orderpriority, n_orders, sum_cents / 100.0 AS sum_price,
      |    round(sum_cents / (100.0 * n_orders), 6) AS avg_price FROM wide)
      |SELECT o_orderpriority, measure, value FROM (
      |  SELECT o_orderpriority, 'n_orders' AS measure, n_orders AS value FROM w2
      |  UNION ALL SELECT o_orderpriority, 'sum_price', sum_price FROM w2
      |  UNION ALL SELECT o_orderpriority, 'avg_price', avg_price FROM w2) u
      |ORDER BY o_orderpriority, measure""".stripMargin

  // B27 (r7): correlated scalar subquery — customers above their own
  // nation's average balance. Catalyst DECORRELATES the subqueries
  // into per-nation aggregates joined back (no per-row re-execution —
  // the only shape that survives at scale; `.explain` shows one
  // Aggregate over c_nationkey under a join, not a subquery node).
  // Exactness: the comparison is the integer cross-multiplication
  // cents·n > Σcents — no division, no float accumulation — so the
  // boundary set is engine-independent.
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).createOrReplaceTempView("graft_b27_customer")
    s.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM graft_b27_customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM graft_b27_customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        |       FROM graft_b27_customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val oScalarSubquery =
    """SELECT c_custkey, c_nationkey, c_acctbal
      |FROM customer c
      |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
      |      (SELECT count(*) FROM customer c2
      |       WHERE c2.c_nationkey = c.c_nationkey)
      |    > (SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
      |       FROM customer c2
      |       WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  // B30 (r8): ordered string aggregation (SQL LISTAGG / string_agg
  // WITHIN GROUP) — the "journey string" pattern: each user's event
  // types concatenated in (ts, event_id) order. Spark has no ordered
  // string_agg aggregate; the scale-correct shape is ONE hash agg
  // collecting (ts, pos, val) structs + a codegen'd per-GROUP
  // array_sort/transform/join — per-group state ∝ group size, no
  // window over the whole table, no second shuffle. Sub-sampled to
  // every 10th user to keep the gate output bounded.
  def qStringAgg(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).filter(col("user_id") % 10 === 0)
    ev.groupBy(col("user_id"))
      .agg(collect_list(struct(col("ts"), col("event_id"), col("event_type"))).as("xs"))
      .select(col("user_id"),
        concat_ws(",", expr("transform(array_sort(xs), x -> x.event_type)"))
          .as("journey"),
        size(col("xs")).as("n_events"))
      .orderBy(col("user_id"))
  }

  private val oStringAgg =
    """SELECT user_id,
      |  string_agg(event_type, ',' ORDER BY ts, event_id) AS journey,
      |  count(*) AS n_events
      |FROM events WHERE user_id % 10 = 0
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // B31 (r8): argmax/argmin + conditional-count aggregates (SQL 2023
  // MAX_BY/MIN_BY/COUNT_IF — the "value at the extremum" idiom that
  // otherwise costs a window + filter): one hash-agg pass, map-side
  // combine; the BY ordinal is the unique event_id so ties cannot
  // make the result engine-dependent. Cents-exact value export.
  def qArgExtremes(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        max_by(col("event_id"), col("event_id")).as("last_event_id"),
        max_by((col("value") * 100).cast("long"), col("event_id")).as("last_value_cents"),
        min_by((col("value") * 100).cast("long"), col("event_id")).as("first_value_cents"),
        count_if(col("value") > 100).as("n_big"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val oArgExtremes =
    """SELECT event_type,
      |  arg_max(event_id, event_id) AS last_event_id,
      |  arg_max(CAST(value * 100 AS BIGINT), event_id) AS last_value_cents,
      |  arg_min(CAST(value * 100 AS BIGINT), event_id) AS first_value_cents,
      |  CAST(count_if(value > 100) AS BIGINT) AS n_big,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // B32 (r8): recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4's
  // UnionLoop execution) — the hierarchy/transitive-closure shape a
  // warehouse serves for org charts and BOM explosions. The fixture
  // hierarchy is arithmetic (parent(k) = k DIV 2, root = key 1) so
  // both engines derive the identical tree from the customer table
  // with no synthesized data. Execution cost is one hash join per
  // LEVEL, and this tree's depth is log2(maxkey) — ~14 rounds at
  // sf0.1, far under the engine's recursion limit; the per-depth
  // aggregate keeps the export bounded (≤ depth rows). At 100 TB the
  // per-round join is the same shuffle-on-key any equi-join runs;
  // depth, not data volume, is the round count.
  def qRecursiveCte(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).createOrReplaceTempView("graft_b32_customer")
    s.sql(
      """WITH RECURSIVE h AS (
        |  SELECT CAST(1 AS BIGINT) AS ckey, 0 AS depth
        |  UNION ALL
        |  SELECT c.c_custkey AS ckey, h.depth + 1 AS depth
        |  FROM graft_b32_customer c JOIN h ON c.c_custkey DIV 2 = h.ckey
        |  WHERE c.c_custkey > 1
        |)
        |SELECT depth, count(*) AS n, CAST(sum(ckey) AS BIGINT) AS sum_keys
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
  }

  private val oRecursiveCte =
    """WITH RECURSIVE h AS (
      |  SELECT CAST(1 AS BIGINT) AS ckey, 0 AS depth
      |  UNION ALL
      |  SELECT c.c_custkey AS ckey, h.depth + 1 AS depth
      |  FROM customer c JOIN h ON c.c_custkey // 2 = h.ckey
      |  WHERE c.c_custkey > 1
      |)
      |SELECT depth, count(*) AS n, CAST(sum(ckey) AS BIGINT) AS sum_keys
      |FROM h GROUP BY depth ORDER BY depth""".stripMargin

  // B33 (r8): correlated LATERAL subquery with ORDER BY + LIMIT — the
  // SQL-standard spelling of "top-N per outer row". Catalyst plans the
  // correlated limit as a per-key window under a join (DecorrelateInnerQuery),
  // NOT a per-row re-execution — same engine shape as B19's bounded
  // top-k, reached from the SQL surface a migrating user writes.
  // Cents conversion keeps the ORDER BY key integral (ties then
  // broken by c_custkey, so LIMIT 2 is engine-independent).
  def qLateralTopn(s: SparkSession, d: String): DataFrame = {
    T.nation(s, d).createOrReplaceTempView("graft_b33_nation")
    T.customer(s, d).createOrReplaceTempView("graft_b33_customer")
    s.sql(
      """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.bal_cents
        |FROM graft_b33_nation n,
        |LATERAL (
        |  SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM graft_b33_customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY bal_cents DESC, c.c_custkey LIMIT 2
        |) t
        |ORDER BY n.n_nationkey, t.bal_cents DESC, t.c_custkey""".stripMargin)
  }

  private val oLateralTopn =
    """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.bal_cents
      |FROM nation n,
      |LATERAL (
      |  SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY bal_cents DESC, c.c_custkey LIMIT 2
      |) t
      |ORDER BY n.n_nationkey, t.bal_cents DESC, t.c_custkey""".stripMargin

  // B34 (r8): interpolated percentiles — percentile_cont / WITHIN
  // GROUP (the ANSI spelling; Spark ≥3.4 and DuckDB agree on the
  // lo + frac·(hi−lo) interpolation). Exactness: the ordered values
  // are integer CENTS and the probes are quarters (0.25/0.5/0.75), so
  // every interpolated result is a dyadic rational — exactly
  // representable, bit-identical across engines regardless of which
  // algebraic form of the interpolation each uses. percentile_disc
  // returns an actual cent value (input type, no interpolation).
  // One hash agg per group; per-group state is the sorted buffer —
  // at 100 TB swap in approx_percentile (B20 gates that path's
  // error bound).
  def qPercentileCont(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("graft_b34_events")
    s.sql(
      """SELECT event_type,
        |  CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS p25,
        |  CAST(percentile_cont(0.50) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS p50,
        |  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS p75,
        |  CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS p50_disc,
        |  count(*) AS n
        |FROM graft_b34_events GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  private val oPercentileCont =
    """SELECT event_type,
      |  CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS p25,
      |  CAST(percentile_cont(0.50) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS p50,
      |  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS p75,
      |  CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS p50_disc,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // B35 (r8): equi-width histogram via width_bucket — the profiling
  // scan behind every "distribution of X" dashboard: ONE pass, one
  // small hash agg keyed by bucket (≤ n+2 groups), map-side combine.
  // DuckDB has no width_bucket, so the oracle re-expresses the
  // boundary arithmetic (floor((x−lo)/w)+1, clamped) — safe here
  // because the closest order total sits a full cent from a boundary
  // (measured 0.01 at sf0.1) while float error at this magnitude is
  // ~1e-10: no value can land on a different side across engines.
  def qHistogram(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(expr("width_bucket(o_totalprice, 0.0, 600000.0, 12)").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), cents(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  private val oHistogram =
    """SELECT LEAST(GREATEST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1, 0), 13) AS bucket,
      |  count(*) AS n,
      |  sum(round(o_totalprice * 100)) / 100.0 AS sum_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // B36 (r8): string scalar-function breadth — the everyday SQL string
  // surface a migrating user leans on (split_part/translate/pad/
  // repeat/reverse/instr/left/right/levenshtein/regexp_count), all
  // codegen'd scalar work on one pruned scan. DuckDB lacks
  // regexp_count, so the oracle re-expresses it as
  // len(regexp_extract_all) — same contract.
  def qStringFuncs(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).filter(col("c_custkey") % 10 === 0)
      .createOrReplaceTempView("graft_b36_customer")
    s.sql(
      """SELECT c_custkey,
        |  split_part(c_name, '#', 2) AS name_id,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |  lpad(CAST(c_nationkey AS STRING), 4, '0') AS nat_pad,
        |  repeat(left(c_mktsegment, 2), 2) AS seg_rep,
        |  reverse(right(c_name, 4)) AS name_rev,
        |  instr(c_name, '#') AS hash_pos,
        |  levenshtein(c_mktsegment, 'MACHINERY') AS lev,
        |  regexp_count(c_name, '0') AS zeros
        |FROM graft_b36_customer ORDER BY c_custkey""".stripMargin)
  }

  private val oStringFuncs =
    """SELECT c_custkey,
      |  split_part(c_name, '#', 2) AS name_id,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
      |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_pad,
      |  repeat(left(c_mktsegment, 2), 2) AS seg_rep,
      |  reverse(right(c_name, 4)) AS name_rev,
      |  CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
      |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev,
      |  CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS zeros
      |FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""".stripMargin

  // B37 (r8): datetime scalar-function breadth — truncation, field
  // extraction, calendar arithmetic (month-end clamping!), day
  // difference. Exported as strings/integers so the gate is
  // bit-exact. Engine mapping pinned where conventions differ:
  // Spark dayofweek is 1-based Sunday-first, DuckDB dow is 0-based
  // Sunday-first (oracle adds 1); add_months clamps Jan 31 + 1 →
  // Feb 28 exactly like DuckDB's +INTERVAL.
  def qDatetimeFuncs(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).filter(col("o_orderkey") % 25 === 0)
      .createOrReplaceTempView("graft_b37_orders")
    s.sql(
      """SELECT o_orderkey,
        |  date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
        |  dayofweek(o_orderdate) AS dow,
        |  weekofyear(o_orderdate) AS woy,
        |  dayofyear(o_orderdate) AS doy,
        |  quarter(o_orderdate) AS qtr,
        |  date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end,
        |  date_format(add_months(o_orderdate, 1), 'yyyy-MM-dd') AS next_month,
        |  datediff(DATE '1999-01-01', o_orderdate) AS days_to_99
        |FROM graft_b37_orders ORDER BY o_orderkey""".stripMargin)
  }

  private val oDatetimeFuncs =
    """SELECT o_orderkey,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  CAST(extract(dow FROM o_orderdate) + 1 AS INT) AS dow,
      |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_99
      |FROM orders WHERE o_orderkey % 25 = 0 ORDER BY o_orderkey""".stripMargin

  // B38 (r8): ROWS-framed moving window (trailing 4-row average) —
  // the moving-average idiom; complements B24's value-RANGE frame.
  // Exactness: the frame sum/count are integers, exported alongside
  // the round(,6)-ed average so the division is pinned; frame order
  // (ts, event_id) is total.
  def qMovingAvg(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    T.events(s, d).filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"),
        sum(cents).over(w).as("frame_cents"),
        count(lit(1)).over(w).cast("long").as("frame_n"))
      .withColumn("moving_avg",
        round(col("frame_cents") / (lit(100.0) * col("frame_n")), 6))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val oMovingAvg =
    """SELECT user_id, event_id, frame_cents, frame_n,
      |  round(frame_cents / (100.0 * frame_n), 6) AS moving_avg
      |FROM (
      |  SELECT user_id, event_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS frame_cents,
      |    CAST(count(*) OVER w AS BIGINT) AS frame_n
      |  FROM events WHERE user_id % 20 = 0
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) t
      |ORDER BY user_id, event_id""".stripMargin

  // B39 (r8): null-aware NOT IN — the classic three-valued-logic trap
  // (one NULL in the subquery makes every NOT IN row UNKNOWN → the
  // result is EMPTY), planned by Spark as a null-aware anti join
  // rather than a row-at-a-time subquery. The gate pins BOTH branches
  // in one result: the NULL-bearing subquery must yield zero
  // survivors, the NULL-free one the true anti-join count — an engine
  // that "fixes" NOT IN to act like NOT EXISTS breaks the first row.
  def qNotInNulls(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("graft_b39_orders")
    T.customer(s, d).createOrReplaceTempView("graft_b39_customer")
    s.sql(
      """SELECT 'with_null' AS variant, count(*) AS n FROM graft_b39_orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END
        |   FROM graft_b39_customer WHERE c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT 'no_null', count(*) FROM graft_b39_orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM graft_b39_customer
        |   WHERE c_mktsegment = 'BUILDING' AND c_custkey % 100 != 0)
        |ORDER BY variant""".stripMargin)
  }

  private val oNotInNulls =
    """SELECT 'with_null' AS variant, count(*) AS n FROM orders
      |WHERE o_custkey NOT IN
      |  (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END
      |   FROM customer WHERE c_mktsegment = 'BUILDING')
      |UNION ALL
      |SELECT 'no_null', count(*) FROM orders
      |WHERE o_custkey NOT IN
      |  (SELECT c_custkey FROM customer
      |   WHERE c_mktsegment = 'BUILDING' AND c_custkey % 100 != 0)
      |ORDER BY variant""".stripMargin

  // B40 (r8): VARIANT ingestion — Spark 4's binary semi-structured
  // type (parse_json → variant_get): the modern replacement for
  // string-JSON probing (B10) — parse ONCE into the columnar variant
  // encoding, then typed path extraction without re-tokenizing the
  // text per access. Same values as the get_json_object path by
  // construction; the oracle extracts from the raw JSON (DuckDB has
  // its own JSON type, not Spark's variant encoding — the CONTRACT is
  // value equality, which is what a user migrating probes cares
  // about). Aggregated per event_type so missing-path semantics
  // (NULL) are exercised in the counts.
  def qVariant(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("graft_b40_events")
    s.sql(
      """SELECT event_type,
        |  sum(variant_get(v, '$.k', 'bigint')) AS sum_k,
        |  count(variant_get(v, '$.missing', 'string')) AS n_missing,
        |  max(variant_get(v, '$.k', 'int')) AS max_k,
        |  count(*) AS n
        |FROM (SELECT event_type, parse_json(props) AS v FROM graft_b40_events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  private val oVariant =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(json_extract_string(props, '$.missing')) AS n_missing,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS INT) AS max_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // B41 (r8): higher-order array functions — transform/filter/
  // aggregate/exists/zip_with/reverse, the lambda surface Spark
  // codegen-inlines per row (no shuffle, no UDF; these are the
  // idioms the C-series token pipelines are built from). Arrays are
  // generated with sequence() from scalar columns so the gate is
  // self-contained and every export integer-exact. Oracle = DuckDB's
  // list_* family (zip_with re-expressed as the closed form
  // Σ x·(x+1), same values).
  def qHigherOrder(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long").as("q"))
      .select(col("l_orderkey"), col("l_linenumber"), col("q"),
        expr("aggregate(transform(sequence(1, l_linenumber), x -> x * q), " +
          "0L, (acc, x) -> acc + x)").as("wsum"),
        expr("size(filter(sequence(1, q), x -> x % 3 = 0))").cast("long").as("div3"),
        expr("exists(sequence(1, l_linenumber), x -> x = 4)").as("has4"),
        expr("array_join(reverse(sequence(1, l_linenumber)), '-')").as("rev"),
        expr("aggregate(zip_with(sequence(1, l_linenumber), " +
          "sequence(2, l_linenumber + 1), (a, b) -> cast(a as long) * b), " +
          "0L, (acc, x) -> acc + x)").as("zsum"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val oHigherOrder =
    """SELECT l_orderkey, l_linenumber, q,
      |  CAST(list_sum(list_transform(range(1, l_linenumber + 1), x -> x * q)) AS BIGINT) AS wsum,
      |  CAST(coalesce(len(list_filter(range(1, q + 1), x -> x % 3 = 0)), 0) AS BIGINT) AS div3,
      |  coalesce(len(list_filter(range(1, l_linenumber + 1), x -> x = 4)), 0) > 0 AS has4,
      |  array_to_string(list_reverse(range(1, l_linenumber + 1)), '-') AS rev,
      |  CAST(list_sum(list_transform(range(1, l_linenumber + 1), x -> x * (x + 1))) AS BIGINT) AS zsum
      |FROM (SELECT l_orderkey, l_linenumber,
      |        CAST(round(l_quantity) AS BIGINT) AS q
      |      FROM lineitem WHERE l_orderkey % 50 = 0) t
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // B42 (r8): regular-expression scalar breadth — extract (with
  // group), extract-all (count + rejoin), replace-all, match test,
  // and split with element access. Patterns stay in the common
  // Java-regex ∩ RE2 subset so both engines read them identically;
  // Spark regexp_replace is replace-ALL by default, DuckDB needs the
  // 'g' flag — the classic cross-engine trap, pinned here.
  def qRegexpFuncs(s: SparkSession, d: String): DataFrame = {
    T.part(s, d).filter(col("p_partkey") % 20 === 0)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        expr("size(regexp_extract_all(p_name, '[aeiou]+', 0))").cast("long")
          .as("vowel_runs"),
        expr("array_join(filter(split(p_name, ' '), w -> length(w) = 5), ',')")
          .as("five_letter"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("masked"),
        col("p_name").rlike("^[a-z]+ ").as("starts_word"),
        expr("element_at(split(p_name, ' '), -1)").as("last_word"),
        expr("size(split(p_name, ' '))").cast("long").as("n_words"))
      .orderBy(col("p_partkey"))
  }

  private val oRegexpFuncs =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
      |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS vowel_runs,
      |  coalesce(array_to_string(list_filter(string_split(p_name, ' '), w -> len(w) = 5), ','), '') AS five_letter,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS masked,
      |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
      |  list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS last_word,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
      |FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""".stripMargin

  // B43 (r8): UNION BY NAME with missing-column reconciliation — the
  // schema-drift union (two extracts of the same table with
  // different column sets and orders, unioned by NAME with NULL
  // fill). Spark: unionByName(allowMissingColumns = true); oracle:
  // DuckDB's UNION ALL BY NAME. The position-based UNION would
  // misalign or reject these — this is the gate that proves the
  // by-name path.
  def qUnionByName(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d)
    val a = o.filter(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("o_custkey"), lit("a").as("src"))
    val b = o.filter(col("o_orderkey") % 40 === 20)
      .select(col("o_orderpriority"), col("o_custkey"), col("o_orderkey"),
        lit("b").as("src"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy(col("o_orderkey"), col("src"))
  }

  private val oUnionByName =
    """SELECT * FROM (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |         o_custkey, 'a' AS src
      |  FROM orders WHERE o_orderkey % 40 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderpriority, o_custkey, o_orderkey, 'b' AS src
      |  FROM orders WHERE o_orderkey % 40 = 20) t
      |ORDER BY o_orderkey, src""".stripMargin

  // B44 (r8): FULL OUTER reconciliation — the two-system diff (ETL
  // audit, migration cutover): full outer join on the key, coalesced
  // key export, per-row match status, and the value delta where both
  // sides exist. NULL-heavy by construction (that's the point); the
  // status CASE pins the three-way branch both engines must agree
  // on. Cents arithmetic keeps the delta integer-exact.
  def qFullOuterRecon(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d)
    val cents = round(col("o_totalprice") * 100).cast("long")
    val a = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("ka"), cents.as("price_a"))
    val b = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("kb"), cents.as("price_b"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(
        coalesce(col("ka"), col("kb")).as("o_orderkey"),
        when(col("ka").isNotNull && col("kb").isNotNull, lit("both"))
          .when(col("ka").isNotNull, lit("left_only"))
          .otherwise(lit("right_only")).as("status"),
        col("price_a"), col("price_b"),
        (coalesce(col("price_a"), lit(0L)) - coalesce(col("price_b"), lit(0L)))
          .as("delta_cents"))
      .filter(col("o_orderkey") % 2 === 1) // keep the export bounded
      .orderBy(col("o_orderkey"))
  }

  private val oFullOuterRecon =
    """SELECT coalesce(ka, kb) AS o_orderkey,
      |  CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN 'both'
      |       WHEN ka IS NOT NULL THEN 'left_only'
      |       ELSE 'right_only' END AS status,
      |  price_a, price_b,
      |  coalesce(price_a, 0) - coalesce(price_b, 0) AS delta_cents
      |FROM (SELECT o_orderkey AS ka, CAST(round(o_totalprice * 100) AS BIGINT) AS price_a
      |      FROM orders WHERE o_orderkey % 3 = 0) a
      |FULL OUTER JOIN
      |     (SELECT o_orderkey AS kb, CAST(round(o_totalprice * 100) AS BIGINT) AS price_b
      |      FROM orders WHERE o_orderkey % 5 = 0) b
      |ON ka = kb
      |WHERE coalesce(ka, kb) % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  // B45 (r8): running distinct count — "cumulative unique users by
  // day", the growth-curve query. Neither engine supports
  // COUNT(DISTINCT) OVER, and the naive self-join is O(days²); the
  // scalable decomposition is FIRST-SEEN: min(day) per user (one
  // hash agg over (user, type)), count by first-seen day, one
  // running sum per type over the |types × days|-row aggregate — the
  // window orders a config-sized frame, never the events. Both
  // engines compute the identical decomposition; all integers.
  def qRunningDistinct(s: SparkSession, d: String): DataFrame = {
    val day = expr(
      "date_format(timestamp_micros(cast(ts div 1000 as long)), 'yyyy-MM-dd')")
    val firstSeen = T.events(s, d)
      .select(col("user_id"), col("event_type"), day.as("day"))
      .groupBy("user_id", "event_type").agg(min("day").as("day"))
    val perDay = firstSeen.groupBy("event_type", "day")
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    perDay.withColumn("cum_users", sum("new_users").over(w))
      .orderBy("event_type", "day")
  }

  private val oRunningDistinct =
    """WITH fs AS (SELECT user_id, event_type, min(strftime(ts, '%Y-%m-%d')) AS day
      |            FROM events GROUP BY user_id, event_type),
      |pd AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS new_users
      |       FROM fs GROUP BY event_type, day)
      |SELECT event_type, day, new_users,
      |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM pd ORDER BY event_type, day""".stripMargin

  // B46 (r8, exported form fixed r9): ordered ARRAY aggregation —
  // per-group sorted lists (the "journey as an array" shape B30
  // exports as a string). Spark: collect_list + sort_array (the
  // aggregation itself is order-nondeterministic, the sort pins it);
  // DuckDB: list(… ORDER BY …). The driver's pandas comparator
  // cannot sort/hash raw array cells (r8 verdict: the one red row),
  // so the gate exports canonical SCALAR renderings of each array —
  // comma-joined elements plus the element count — which pin the
  // same ordered content byte-for-byte. The first-class array-typed
  // surface stays pinned in RelationalSpec (same construction,
  // element-wise equality).
  def qSortedArrays(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).filter(col("l_orderkey") % 100 === 0)
      .groupBy("l_orderkey").agg(
        sort_array(collect_list(col("l_linenumber"))).as("lines"),
        sort_array(collect_list(
          concat(col("l_returnflag"), col("l_linestatus")))).as("flags"),
        sort_array(collect_set(col("l_returnflag"))).as("flags_distinct"))
      .select(col("l_orderkey"),
        array_join(col("lines").cast("array<string>"), ",").as("lines_s"),
        size(col("lines")).as("n_lines"),
        array_join(col("flags"), ",").as("flags_s"),
        array_join(col("flags_distinct"), ",").as("flags_distinct_s"))
      .orderBy(col("l_orderkey"))

  private val oSortedArrays =
    """SELECT l_orderkey,
      |  array_to_string(list(CAST(l_linenumber AS VARCHAR) ORDER BY l_linenumber), ',')
      |    AS lines_s,
      |  CAST(count(*) AS INT) AS n_lines,
      |  array_to_string(list(l_returnflag || l_linestatus
      |    ORDER BY l_returnflag || l_linestatus), ',') AS flags_s,
      |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',')
      |    AS flags_distinct_s
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // B47 (r8): JSON breadth v2 — from_json with an ARRAY schema +
  // posexplode (B10 covers scalar extraction), and the to_json
  // serialization direction. The array is BUILT from known columns,
  // so the oracle checks Spark's parse → explode path against ground
  // truth that never went through JSON — a parser bug can't cancel
  // itself out. to_json output is byte-compared against DuckDB's
  // (both emit compact `{"k":v}` with insertion order).
  def qJsonArray(s: SparkSession, d: String): DataFrame = {
    T.documents(s, d).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"), col("source"),
        concat(lit("[\""), col("lang"), lit("\",\""), col("source"), lit("\"]"))
          .as("arr_json"))
      .select(col("doc_id"),
        posexplode(from_json(col("arr_json"), lit("array<string>")))
          .as(Seq("pos", "element")),
        to_json(struct(col("doc_id"), col("lang"))).as("obj_json"))
      .orderBy(col("doc_id"), col("pos"))
  }

  private val oJsonArray =
    """SELECT doc_id, pos,
      |  CASE WHEN pos = 0 THEN lang ELSE source END AS element,
      |  CAST(to_json(struct_pack(doc_id := doc_id, lang := lang)) AS VARCHAR)
      |    AS obj_json
      |FROM documents CROSS JOIN (VALUES (0), (1)) p(pos)
      |WHERE doc_id % 5 = 0
      |ORDER BY doc_id, pos""".stripMargin

  // B48 (r8): map-typed column breadth — build a map event_type→count
  // per user (map_from_entries over a sorted entry list), then derive
  // every export THROUGH the map surface: size, element_at with a
  // missing-key default, a map_values fold, map_filter + map_keys.
  // The oracle computes the same numbers with conditional aggregation
  // that never touches a map, so a construction/access/lambda bug
  // cannot cancel itself (the B47 discipline). All per-row lambda
  // work; one hash agg per level — no extra shuffle beyond the agg.
  def qMapFuncs(s: SparkSession, d: String): DataFrame = {
    val per = T.events(s, d).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val m = per.groupBy("user_id")
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
    m.select(col("user_id"),
        size(col("m")).as("n_types"),
        coalesce(element_at(col("m"), "error"), lit(0L)).as("error_cnt"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total"),
        size(expr("map_filter(m, (k, v) -> v >= 10)")).as("n_heavy"),
        expr("array_join(array_sort(map_keys(map_filter(m, (k, v) -> v >= 10))), ',')")
          .as("heavy_types"))
      .orderBy("user_id")
  }

  private val oMapFuncs =
    """WITH per AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      |             FROM events GROUP BY user_id, event_type)
      |SELECT user_id,
      |  CAST(count(*) AS INT) AS n_types,
      |  CAST(coalesce(sum(cnt) FILTER (WHERE event_type = 'error'), 0) AS BIGINT)
      |    AS error_cnt,
      |  CAST(sum(cnt) AS BIGINT) AS total,
      |  CAST(count(*) FILTER (WHERE cnt >= 10) AS INT) AS n_heavy,
      |  coalesce(string_agg(event_type, ',' ORDER BY event_type)
      |    FILTER (WHERE cnt >= 10), '') AS heavy_types
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  // B49 (r8): gaps-and-islands — per-user runs of CONSECUTIVE active
  // days via the classic day − row_number() island key (one window
  // over the per-user distinct-day relation, state ∝ active days,
  // never events), then per-island and per-user rollups: streak
  // count, longest streak, and the start of the longest (max-struct
  // tie-break → the LATEST longest streak, deterministic). The
  // sessionization idiom on the calendar axis (B14 is the
  // event-time-gap form).
  def qGapsIslands(s: SparkSession, d: String): DataFrame = {
    val days = T.events(s, d).filter(col("user_id") % 10 === 0)
      .select(col("user_id"), expr("ts div 86400000000000L").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max(struct(col("len"), col("start_day"))).as("_b"))
      .select(col("user_id"), col("n_streaks"),
        col("_b.len").as("longest"), col("_b.start_day").as("longest_start"))
      .orderBy("user_id")
  }

  private val oGapsIslands =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events WHERE user_id % 10 = 0),
      |isl AS (
      |  SELECT user_id, day - row_number() OVER (PARTITION BY user_id
      |    ORDER BY day) AS grp, day FROM days),
      |runs AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
      |    CAST(min(day) AS BIGINT) AS start_day
      |  FROM isl GROUP BY user_id, grp)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
      |  CAST(max(len) AS BIGINT) AS longest,
      |  CAST(arg_max(start_day, len * 1000000000 + start_day) AS BIGINT)
      |    AS longest_start
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  // B50 (r8): regression/correlation MOMENTS as exact integers — the
  // scalable substrate of corr/covar/regr_slope: one hash-agg pass
  // accumulates (n, Σx, Σy, Σxy, Σx², Σy²) per group in BIGINT
  // (x = quantity, y = whole dollars — bounded so Σy² stays ≪ 2⁶³),
  // and the derived slope/corr are computed FROM those integers in a
  // pinned double formula (every product correctly rounded from exact
  // integer inputs, sqrt correctly rounded — bit-deterministic across
  // engines given the identical association). The moments, not the
  // derived floats, are what an incremental/distributed maintainer
  // would store: they merge by addition.
  def qCorrMoments(s: SparkSession, d: String): DataFrame = {
    val x = round(col("l_quantity")).cast("long")
    val y = expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100")
    val m = T.lineitem(s, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sum_x"), sum("y").as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y") * col("y")).as("sum_y2"))
    val nd = col("n").cast("double")
    val cov = nd * col("sum_xy") - col("sum_x").cast("double") * col("sum_y")
    val vx = nd * col("sum_x2") - col("sum_x").cast("double") * col("sum_x")
    val vy = nd * col("sum_y2") - col("sum_y").cast("double") * col("sum_y")
    m.select(col("l_returnflag"), col("n"), col("sum_x"), col("sum_y"),
        col("sum_xy"), col("sum_x2"), col("sum_y2"),
        round(cov / vx, 6).as("slope"),
        round(cov / (sqrt(vx) * sqrt(vy)), 6).as("corr"))
      .orderBy("l_returnflag")
  }

  private val oCorrMoments =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
      |    CAST(sum(x * y) AS BIGINT) AS sum_xy,
      |    CAST(sum(x * x) AS BIGINT) AS sum_x2,
      |    CAST(sum(y * y) AS BIGINT) AS sum_y2
      |  FROM b GROUP BY l_returnflag)
      |SELECT l_returnflag, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
      |  round((CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
      |    / (CAST(n AS DOUBLE) * sum_x2 - CAST(sum_x AS DOUBLE) * sum_x), 6)
      |    AS slope,
      |  round((CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
      |    / (sqrt(CAST(n AS DOUBLE) * sum_x2 - CAST(sum_x AS DOUBLE) * sum_x)
      |     * sqrt(CAST(n AS DOUBLE) * sum_y2 - CAST(sum_y AS DOUBLE) * sum_y)), 6)
      |    AS corr
      |FROM m ORDER BY l_returnflag""".stripMargin

  // B51 (r8): nth_value + IGNORE NULLS window navigation — the two
  // gaps B25 left: nth_value(2) over the explicit whole-partition
  // frame (the default running frame would leave row 1 NULL), and the
  // last NON-NULL carry (last_value IGNORE NULLS over the running
  // frame — error events contribute NULL, so the column reads "value
  // of my latest non-error event so far", NULL until one exists).
  // One window pass per user in (ts, event_id) total order.
  def qNthValue(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val full = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d).filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") =!= "error", cents).as("ok_cents"))
      .withColumn("second_cents",
        nth_value(col("ok_cents"), 2).over(full))
      .withColumn("last_ok_cents",
        last(col("ok_cents"), ignoreNulls = true).over(run))
      .drop("ts")
      .orderBy("user_id", "event_id")
  }

  private val oNthValue =
    """SELECT user_id, event_id,
      |  CASE WHEN event_type <> 'error'
      |    THEN CAST(round(value * 100) AS BIGINT) END AS ok_cents,
      |  nth_value(CASE WHEN event_type <> 'error'
      |      THEN CAST(round(value * 100) AS BIGINT) END, 2)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS second_cents,
      |  last_value(CASE WHEN event_type <> 'error'
      |      THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS last_ok_cents
      |FROM events WHERE user_id % 20 = 0
      |ORDER BY user_id, event_id""".stripMargin

  // B52 (r8): relational division with multiplicity — "users who did
  // EVERY event type at least 10 times" (the FOR ALL quantifier SQL
  // lacks): two hash aggs — per-(user, type) counts, then per-user
  // `count(*) = |divisor| AND min(cnt) ≥ k` against the corpus-wide
  // type count (a 1-row agg cross-joined in, never hardcoded). The
  // double-NOT-EXISTS spelling re-plans as per-row subqueries;
  // this shape is two shuffles total at any scale. Non-vacuous at
  // sf0.01: 73 of 150 users qualify.
  def qRelDivision(s: SparkSession, d: String): DataFrame = {
    val per = T.events(s, d).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val nTypes = per.select(countDistinct("event_type").as("n_types"))
    per.groupBy("user_id")
      .agg(count(lit(1)).as("types_hit"), min("cnt").as("min_cnt"),
        sum("cnt").as("n_events"))
      .crossJoin(broadcast(nTypes))
      .filter(col("types_hit") === col("n_types") && col("min_cnt") >= 10)
      .select(col("user_id"), col("min_cnt"), col("n_events"))
      .orderBy("user_id")
  }

  private val oRelDivision =
    """WITH per AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      |             FROM events GROUP BY user_id, event_type),
      |nt AS (SELECT count(DISTINCT event_type) AS n_types FROM per)
      |SELECT user_id, CAST(min(cnt) AS BIGINT) AS min_cnt,
      |  CAST(sum(cnt) AS BIGINT) AS n_events
      |FROM per CROSS JOIN nt
      |GROUP BY user_id, n_types
      |HAVING count(*) = n_types AND min(cnt) >= 10
      |ORDER BY user_id""".stripMargin

  // B53 (r8): bitwise aggregates — bit_and / bit_or / bit_xor over a
  // per-event 8-bit flag word (built arithmetically from event_id so
  // both engines derive identical inputs): the permission-mask /
  // feature-flag rollup idiom. One hash-agg pass; each bitwise
  // aggregate combines map-side (they're commutative monoids) so
  // shuffle rows ∝ groups. xor doubles as a cheap order-independent
  // set checksum (the same trick the A24 diff oracle leans on).
  def qBitwiseAgg(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type"), (col("event_id") % 256).as("flags"),
        col("event_id"))
      .groupBy("event_type")
      .agg(expr("bit_and(flags)").as("mask_and"),
        expr("bit_or(flags)").as("mask_or"),
        expr("bit_xor(flags)").as("mask_xor"),
        expr("bit_xor(event_id)").as("id_checksum"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  private val oBitwiseAgg =
    """SELECT event_type,
      |  CAST(bit_and(event_id % 256) AS BIGINT) AS mask_and,
      |  CAST(bit_or(event_id % 256) AS BIGINT) AS mask_or,
      |  CAST(bit_xor(event_id % 256) AS BIGINT) AS mask_xor,
      |  CAST(bit_xor(event_id) AS BIGINT) AS id_checksum,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // B54 (r8): time-weighted average — the TWAP/metering idiom: a
  // value "holds" from its event until the next one, so the mean
  // weights each observation by its holding duration, not its count
  // (a sensor that reports once an hour and once a second must agree).
  // One window pass per user for the lead, then one hash agg; the
  // weighted sum Σ dur_s·cents stays in BIGINT (seconds × cents
  // bounds the product far under 2⁶³), division pinned at the end.
  // The final open-ended observation carries no duration and is
  // excluded — the standard left-closed integral.
  // B89 (r10): business-day arithmetic — SLA/latency reporting in
  // working days, the classic calendar op warehouses ship as
  // NETWORKDAYS. Closed form, no calendar table and no per-day
  // explode: f(d) = 5·(n div 7) + least(n mod 7, 5) counts business
  // days from an anchor MONDAY to d (n = days since the anchor), so
  // a span is f(end) − f(start) — two datediffs and integer
  // arithmetic per row, fully codegen'd, join + agg is the only
  // shuffle. The anchor (1990-01-01, a Monday) predates every date
  // in the data so n stays non-negative — Spark's `div` truncates
  // toward zero while DuckDB's `//` floors, and keeping n ≥ 0 keeps
  // the two semantics identical (the hash compare would catch any
  // drift).
  def qBusinessDays(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    val o = T.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("n_ship", datediff(col("l_shipdate"), lit("1990-01-01")))
      .withColumn("n_ord", datediff(col("o_orderdate"), lit("1990-01-01")))
      .withColumn("bdays",
        (lit(5) * expr("n_ship div 7") + least(expr("n_ship % 7"), lit(5))) -
          (lit(5) * expr("n_ord div 7") + least(expr("n_ord % 7"), lit(5))))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("bdays")).cast("long").as("sum_bdays"),
        max(col("bdays")).cast("long").as("max_bdays"),
        min(col("bdays")).cast("long").as("min_bdays"))
      .orderBy("o_orderpriority")
  }

  private val oBusinessDays =
    """WITH j AS (
      |  SELECT o.o_orderpriority,
      |    date_diff('day', DATE '1990-01-01', l.l_shipdate) AS n_ship,
      |    date_diff('day', DATE '1990-01-01', o.o_orderdate) AS n_ord
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |b AS (
      |  SELECT o_orderpriority,
      |    (5 * (n_ship // 7) + least(n_ship % 7, 5)) -
      |    (5 * (n_ord // 7) + least(n_ord % 7, 5)) AS bdays
      |  FROM j)
      |SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(sum(bdays) AS BIGINT) AS sum_bdays,
      |  CAST(max(bdays) AS BIGINT) AS max_bdays,
      |  CAST(min(bdays) AS BIGINT) AS min_bdays
      |FROM b GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // B90 (r10): largest-remainder allocation — prorate an order's
  // total across its lines so the integer cents sum EXACTLY to the
  // total (billing/revenue-recognition's classic constraint, where
  // naive rounding leaks cents): base = floor(T·qᵢ/Q), then the
  // T − Σbase leftover cents go one each to the lines with the
  // largest division remainders (tie: lowest line number — fully
  // deterministic). One window over the ORDER's lines (partition =
  // order key, group sizes ≤ 7 in TPC-H — no skew), integers end to
  // end. Universe: every 50th order, keeping the export bounded at
  // bench SF.
  def qAllocation(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"))
    val o = T.orders(s, d).filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
    val w = Window.partitionBy("l_orderkey")
    // this synthetic lineitem reuses l_linenumber within an order, so
    // the deterministic tie-break needs l_partkey as the final key
    val wr = Window.partitionBy("l_orderkey")
      .orderBy(col("rem").desc, col("l_linenumber"), col("l_partkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("qty_sum", sum(col("qty")).over(w))
      .withColumn("base", expr("total_cents * qty div qty_sum"))
      .withColumn("rem", expr("(total_cents * qty) % qty_sum"))
      .withColumn("leftover", col("total_cents") - sum(col("base")).over(w))
      .withColumn("rk", row_number().over(wr))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc_cents"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  private val oAllocation =
    """WITH li AS (
      |  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
      |    CAST(l.l_quantity AS BIGINT) AS qty,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_orderkey % 50 = 0),
      |calc AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, qty, total_cents,
      |    sum(qty) OVER (PARTITION BY l_orderkey) AS qty_sum
      |  FROM li),
      |base AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    total_cents * qty // qty_sum AS base,
      |    (total_cents * qty) % qty_sum AS rem,
      |    total_cents - sum(total_cents * qty // qty_sum)
      |      OVER (PARTITION BY l_orderkey) AS leftover
      |  FROM calc),
      |ranked AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, base, leftover,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY rem DESC, l_linenumber, l_partkey) AS rk
      |  FROM base)
      |SELECT l_orderkey, l_linenumber, l_partkey,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc_cents
      |FROM ranked ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin

  // B91 (r10): sweep-line peak concurrency — "how many order lines
  // were OPEN AT ONCE per supplier" (an interval = order placed →
  // line shipped; the same shape answers rooms double-booked,
  // sessions live, connections open — capacity planning's staple).
  // The classic re-expression avoids both the per-day explode (a
  // 90-day open line would fan 90×) and the self-join (quadratic in
  // overlaps): each interval becomes TWO delta events (+1 at the
  // order date, −1 the day AFTER shipping — endpoints inclusive), a
  // per-(supplier, day) hash agg nets same-day events FIRST (killing
  // intra-day ordering ambiguity — end-of-day occupancy is
  // order-free), and one running sum per supplier walks the day
  // axis. Partition = one supplier's DISTINCT ACTIVE DAYS (≤ the
  // calendar span however many lines it has — the 100 TB shape:
  // window state bounded by the calendar, not the data); peak day =
  // first day attaining the peak, deterministic.
  /** B91 core, injectable for the laws spec: intervals (k, d0, d1x)
    * on any ordered day axis, `d1x` EXCLUSIVE (the day after the
    * interval ends — callers on a date axis pass date_add(end, 1),
    * integer axes pass end + 1) → per-key (peak_concurrent,
    * peak_day = first day attaining it, n_intervals).
    */
  def peakConcurrency(iv: DataFrame): DataFrame = {
    // one explode, not a unionAll of two selects — the union form
    // executes the upstream scan/join TWICE (each branch re-reads);
    // the inline 2-element array keeps it one pass
    val deltas = iv.select(col("k"), explode(array(
        struct(col("d0").as("dt"), lit(1L).as("delta")),
        struct(col("d1x").as("dt"), lit(-1L).as("delta")))).as("e"))
      .select(col("k"), col("e.dt").as("dt"), col("e.delta").as("delta"))
    val daily = deltas.groupBy("k", "dt")
      .agg(sum(col("delta")).as("net"),
        sum(when(col("delta") > 0, 1L).otherwise(0L)).as("starts"))
    val wRun = Window.partitionBy("k").orderBy("dt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("k")
    daily
      .withColumn("running", sum(col("net")).over(wRun))
      .withColumn("peak", max(col("running")).over(wAll))
      .withColumn("n_intervals", sum(col("starts")).over(wAll))
      .filter(col("running") === col("peak"))
      .groupBy("k")
      .agg(max(col("peak")).cast("long").as("peak_concurrent"),
        min(col("dt")).as("peak_day"),
        max(col("n_intervals")).cast("long").as("n_intervals"))
  }

  def qMaxConcurrent(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    // r15: the broadcast join + 2-way interval explode + daily partial
    // aggregation all ran in the 3 scan tasks (measured 1.15 s) —
    // spread the joined interval set by input size first.
    peakConcurrency(graft.ops.Spread.byBytes(
        li.select(col("l_suppkey").as("k"),
          col("o_orderdate").cast("date").as("d0"),
          date_add(col("l_shipdate"), 1).as("d1x")), 256L << 10))
      .select(col("k").as("l_suppkey"),
        col("peak_concurrent"),
        col("peak_day").cast("timestamp").as("peak_date"),
        col("n_intervals").as("n_shipments"))
      .orderBy("l_suppkey")
  }

  private val oMaxConcurrent =
    """WITH li AS MATERIALIZED (
      |  SELECT l.l_suppkey, l.l_shipdate, o.o_orderdate
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |deltas AS (
      |  SELECT l_suppkey, CAST(o_orderdate AS DATE) AS dt, 1 AS delta FROM li
      |  UNION ALL
      |  SELECT l_suppkey, CAST(l_shipdate AS DATE) + 1, -1 FROM li),
      |daily AS (
      |  SELECT l_suppkey, dt, sum(delta) AS net,
      |    sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS starts
      |  FROM deltas GROUP BY l_suppkey, dt),
      |run AS (
      |  SELECT l_suppkey, dt,
      |    sum(net) OVER (PARTITION BY l_suppkey ORDER BY dt
      |      ROWS UNBOUNDED PRECEDING) AS running,
      |    sum(starts) OVER (PARTITION BY l_suppkey) AS n_shipments
      |  FROM daily),
      |peak AS (
      |  SELECT l_suppkey, dt, running, n_shipments,
      |    max(running) OVER (PARTITION BY l_suppkey) AS pk
      |  FROM run)
      |SELECT l_suppkey, CAST(max(pk) AS BIGINT) AS peak_concurrent,
      |  CAST(min(dt) AS TIMESTAMP) AS peak_date,
      |  CAST(max(n_shipments) AS BIGINT) AS n_shipments
      |FROM peak WHERE running = pk
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  // B92 (r10): blocked exact nearest-neighbor — "nearest in-country
  // depot per customer" (logistics assignment, store-locator rollups).
  // Coordinates are a deterministic integer grid derived from the
  // keys (the tables carry no geography; two LCG-style multipliers
  // spread keys over a 100k×100k grid identically in both engines),
  // so the distance is EXACT BIGINT squared-Euclidean — no trig, no
  // float argmin flips near ties. The block key (nation) bounds the
  // quadratic: candidates = customers × suppliers WITHIN one nation,
  // supplier side broadcast (dims are small); per-customer argmin is
  // a row_number over ≤ |suppliers in nation| candidates with a
  // deterministic (dist², suppkey) tie-break. At 100 TB with BOTH
  // sides large the same plan swaps the nation block for grid-cell
  // buckets + neighbor-cell expansion (the C2 LSH band shape);
  // the nation block is the exact-answer variant a business rule
  // ("in-country only") makes closed-form.
  def qSpatialNn(s: SparkSession, d: String): DataFrame = {
    val cust = T.customer(s, d).filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_custkey") * 48271L % 100000L).as("cx"),
        (col("c_custkey") * 69621L % 100000L).as("cy"))
    val supp = T.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"),
        (col("s_suppkey") * 48271L % 100000L).as("sx"),
        (col("s_suppkey") * 69621L % 100000L).as("sy"))
    val wNn = Window.partitionBy("c_custkey")
      .orderBy(col("dist2"), col("s_suppkey"))
    cust.join(broadcast(supp), col("c_nationkey") === col("s_nationkey"))
      .withColumn("dist2",
        (col("cx") - col("sx")) * (col("cx") - col("sx")) +
          (col("cy") - col("sy")) * (col("cy") - col("sy")))
      .withColumn("rn", row_number().over(wNn))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
        col("s_suppkey").as("nn_suppkey"), col("dist2").cast("long").as("dist2"))
      .orderBy("c_custkey")
  }

  private val oSpatialNn =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |    c_custkey * 48271 % 100000 AS cx,
      |    c_custkey * 69621 % 100000 AS cy
      |  FROM customer WHERE c_custkey % 10 = 0),
      |supp AS (
      |  SELECT s_suppkey, s_nationkey,
      |    s_suppkey * 48271 % 100000 AS sx,
      |    s_suppkey * 69621 % 100000 AS sy
      |  FROM supplier),
      |cand AS (
      |  SELECT c_custkey, c_nationkey, s_suppkey,
      |    (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2,
      |    row_number() OVER (PARTITION BY c_custkey
      |      ORDER BY (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy),
      |        s_suppkey) AS rn
      |  FROM cust JOIN supp ON c_nationkey = s_nationkey)
      |SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
      |  s_suppkey AS nn_suppkey, CAST(dist2 AS BIGINT) AS dist2
      |FROM cand WHERE rn = 1 ORDER BY c_custkey""".stripMargin

  // B93 (r10): clamped running balance — warehouse stock with
  // stock-outs: balance ← max(0, balance + delta), the recurrence NO
  // window frame can express (the clamp makes each step depend on the
  // clamped previous step, not on any prefix sum — once inventory
  // floors at zero, later receipts start from 0, so
  // final ≠ max(0, Σdelta)). Same re-expression as B88's EWMA: one
  // hash agg collects each part's events, sorted by a TOTAL
  // deterministic key (day, order, line, delta — this lineitem reuses
  // line numbers, the B90 lesson), then a codegen'd `aggregate` fold
  // runs the clamp — sequential per PART, parallel across parts,
  // state ∝ one part's events (the right 100 TB shape). Receipts =
  // even lines, issues = odd lines (deterministic sign fixture);
  // the unclamped aggregates ride along so the export pins BOTH the
  // plain sums and the genuinely sequential clamp result.
  /** B93 core, injectable for the laws spec: events
    * (k, day, ok, ln, delta) → per-key clamped fold
    * s ← max(0, s + delta) over the TOTAL (day, ok, ln, delta) order,
    * plus the unclamped receipt/issue sums.
    */
  def clampedBalance(ev: DataFrame): DataFrame =
    ev.groupBy("k")
      .agg(sort_array(collect_list(struct(col("day"), col("ok"), col("ln"),
          col("delta")))).as("evs"),
        count(lit(1)).as("n_events"),
        sum(when(col("delta") > 0, col("delta")).otherwise(0L)).as("received"),
        sum(when(col("delta") < 0, -col("delta")).otherwise(0L)).as("issued"))
      .withColumn("final_balance",
        expr("aggregate(evs, 0L, (s, e) -> greatest(0L, s + e.delta))"))
      .select("k", "n_events", "received", "issued", "final_balance")

  /** B93 scale path (r11 — the hot-key bound): segmented two-level
    * clamp fold. `clampedBalance` holds state ∝ one KEY's events; a
    * pathologically hot key is unbounded. The clamp closes under
    * composition — each event's step f_δ(s) = max(0, s+δ) is of the
    * form f(s) = max(b, s+a), and (f₂∘f₁)(s) = max(max(b₂, b₁+a₂),
    * s + (a₁+a₂)), so a CONTIGUOUS run of events reduces exactly to
    * one (a, b) pair. Level 1 therefore groups by (k, day div
    * segWidth) — the segment id is a prefix of the total order
    * (day, ok, ln, delta), so segments are contiguous runs — and
    * folds each segment's sorted events into its (a, b): state ∝ one
    * key's events IN ONE SEGMENT. Level 2 groups by k over the FEW
    * per-segment pairs (≤ calendar/segWidth, data-independent) and
    * applies s ← max(b, s+a) in segment order. Exact (integer
    * arithmetic, associative composition law — proven segmented ≡
    * sequential in RelationalLawsSpec), same schema/rows as
    * `clampedBalance`.
    */
  def clampedBalanceSegmented(ev: DataFrame, segWidth: Long): DataFrame = {
    // identity for b: an absorbing -2^62 ("-inf" that cannot underflow
    // when a sane delta is added); after the first composed event b is
    // always ≥ 0, so the sentinel never escapes a non-empty segment.
    val negInf = -4611686018427387904L
    val segs = ev.withColumn("seg", expr(s"day div ${segWidth}L"))
      .groupBy("k", "seg")
      .agg(sort_array(collect_list(struct(col("day"), col("ok"), col("ln"),
          col("delta")))).as("evs"),
        count(lit(1)).as("n_events"),
        sum(when(col("delta") > 0, col("delta")).otherwise(0L)).as("received"),
        sum(when(col("delta") < 0, -col("delta")).otherwise(0L)).as("issued"))
      .select(col("k"), col("seg"), col("n_events"), col("received"),
        col("issued"),
        expr(s"""aggregate(evs, named_struct('a', 0L, 'b', ${negInf}L),
                 (acc, e) -> named_struct('a', acc.a + e.delta,
                                          'b', greatest(0L, acc.b + e.delta)))""")
          .as("f"))
    segs.groupBy("k")
      .agg(sort_array(collect_list(struct(col("seg"), col("f.a").as("a"),
          col("f.b").as("b")))).as("runs"),
        sum("n_events").as("n_events"),
        sum("received").as("received"),
        sum("issued").as("issued"))
      .withColumn("final_balance",
        expr("aggregate(runs, 0L, (s, e) -> greatest(e.b, s + e.a))"))
      .select("k", "n_events", "received", "issued", "final_balance")
  }

  def qInventoryBalance(s: SparkSession, d: String): DataFrame = {
    // r14: spread the scan — the per-(k,seg) collect_list partial agg
    // ran in the single scan task of the one-row-group lineitem file
    // (measured 1.85 s of the 2.6 s total). r15: width from input
    // size (Spread.byBytes; the driver's scaling run showed the flat
    // 32-way spread anti-scaling at this input size).
    val ev = graft.ops.Spread.byBytes(T.lineitem(s, d).select(col("l_partkey").as("k"),
      datediff(col("l_shipdate"), lit("1990-01-01")).cast("long").as("day"),
      col("l_orderkey").as("ok"), col("l_linenumber").cast("long").as("ln"),
      when(col("l_linenumber") % 2 === 0, col("l_quantity"))
        .otherwise(-col("l_quantity")).cast("long").as("delta")), 512L << 10)
    // segWidth 256: lineitem ship-days span ~730..3300 from the epoch
    // anchor, so each part folds ≤ ~11 segment pairs at level 2 and
    // ≤ a 256-day window's events at level 1 — the hot-key-bounded
    // production shape (law-spec-proven ≡ the sequential fold).
    clampedBalanceSegmented(ev, segWidth = 256L)
      .select(col("k").as("l_partkey"), col("n_events"), col("received"),
        col("issued"), col("final_balance"))
      .orderBy("l_partkey")
  }

  private val oInventoryBalance =
    """WITH ev AS (
      |  SELECT l_partkey,
      |    date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS day,
      |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
      |    CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_quantity AS BIGINT)
      |         ELSE -CAST(l_quantity AS BIGINT) END AS delta
      |  FROM lineitem),
      |g AS (
      |  SELECT l_partkey,
      |    list_sort(list({'day': day, 'ok': ok, 'ln': ln, 'delta': delta}))
      |      AS evs,
      |    count(*) AS n_events,
      |    CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
      |      AS received,
      |    CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) AS BIGINT)
      |      AS issued
      |  FROM ev GROUP BY l_partkey)
      |SELECT l_partkey, n_events, received, issued,
      |  CAST(list_reduce(
      |    list_prepend(CAST(0 AS BIGINT), list_transform(evs, e -> e.delta)),
      |    (a, c) -> greatest(0, a + c)) AS BIGINT) AS final_balance
      |FROM g ORDER BY l_partkey""".stripMargin

  // B97 (r10): sample-ratio-mismatch guardrail — the FIRST check an
  // experiment readout runs (B64 compares conversion; SRM asks
  // whether the assignment itself is broken — a biased splitter
  // invalidates everything downstream): χ² goodness-of-fit of the
  // observed arm counts against the designed 50/50, which for two
  // equal arms collapses to (n_a − n_b)²/N — integer micro exactly.
  // Same deterministic assignment rule as B64, so the two gates
  // audit the same experiment. The 3.841 cut (α=0.05, 1 dof) is a
  // shared integer literal.
  def qAbSrm(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(col("user_id")).distinct()
      .withColumn("va", expr("(user_id * 554862419L) % 1000000 < 500000"))
      .agg(sum(when(col("va"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("va"), 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        expr("(n_a - n_b) * (n_a - n_b) * 1000000L div (n_a + n_b)")
          .as("srm_chi_micro"))
      .withColumn("srm_detected", col("srm_chi_micro") > 3841459L)

  private val oAbSrm =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events),
      |c AS (
      |  SELECT
      |    CAST(sum(CASE WHEN (user_id * 554862419) % 1000000 < 500000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN (user_id * 554862419) % 1000000 < 500000
      |      THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM u)
      |SELECT n_a, n_b,
      |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS srm_chi_micro,
      |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) > 3841459
      |    AS srm_detected
      |FROM c""".stripMargin

  // B98 (r10): rolling-origin forecast backtest — the eval that keeps
  // B69's trend forecast honest: at every day t with ≥3 points of
  // history, fit OLS on days ≤ t ONLY (running sums — no refit scans:
  // Σ1, Σx, Σy, Σxy, Σx² accumulate in one window pass per key) and
  // score the 1-step-ahead prediction against the next observed day.
  // The slope/forecast arithmetic reuses B69's split integer division
  // verbatim, so backtest and forecast can never disagree on the
  // math. Export per key: fold count and integer-milli MAE/worst-case
  // — report ∝ keys, the only window walks one key's days.
  def qForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("event_type"),
      expr("(ts div 1000) div 86400000000").as("day"))
    val minDay = ev.agg(min("day").as("day0"))
    val daily = ev.crossJoin(broadcast(minDay))
      .select(col("event_type"), (col("day") - col("day0")).as("x"))
      .groupBy("event_type", "x").agg(count(lit(1)).as("y"))
    val w = Window.partitionBy("event_type").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.partitionBy("event_type").orderBy("x")
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("xn", lead(col("x"), 1).over(wl))
      .withColumn("yn", lead(col("y"), 1).over(wl))
      .filter(col("n") >= 3 && col("xn").isNotNull)
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .withColumn("slope_milli",
        expr("(num div den) * 1000 + ((num % den) * 1000) div den"))
      .withColumn("pred_milli",
        expr("(sy * 1000) div n + (slope_milli * (n * xn - sx)) div n"))
      .withColumn("err_milli", abs(col("pred_milli") - col("yn") * 1000L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_folds"),
        expr("sum(err_milli) div count(1)").as("mae_milli"),
        max(col("err_milli")).as("max_err_milli"))
      .orderBy("event_type")
  }

  private val oForecastBacktest =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
      |d0 AS (SELECT min(day) AS day0 FROM ev),
      |daily AS (
      |  SELECT event_type, day - day0 AS x, CAST(count(*) AS BIGINT) AS y
      |  FROM ev, d0 GROUP BY 1, 2),
      |run AS (
      |  SELECT event_type, x, y,
      |    CAST(count(*) OVER win AS BIGINT) AS n,
      |    CAST(sum(x) OVER win AS BIGINT) AS sx,
      |    CAST(sum(y) OVER win AS BIGINT) AS sy,
      |    CAST(sum(x * y) OVER win AS BIGINT) AS sxy,
      |    CAST(sum(x * x) OVER win AS BIGINT) AS sxx,
      |    lead(x) OVER (PARTITION BY event_type ORDER BY x) AS xn,
      |    lead(y) OVER (PARTITION BY event_type ORDER BY x) AS yn
      |  FROM daily
      |  WINDOW win AS (PARTITION BY event_type ORDER BY x
      |    ROWS UNBOUNDED PRECEDING)),
      |folds AS (
      |  SELECT event_type,
      |    (num // den) * 1000 + ((num % den) * 1000) // den AS slope_milli,
      |    sy, n, sx, xn, yn
      |  FROM (SELECT *, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
      |        FROM run WHERE n >= 3 AND xn IS NOT NULL) t),
      |scored AS (
      |  SELECT event_type,
      |    abs((sy * 1000) // n + (slope_milli * (n * xn - sx)) // n
      |      - yn * 1000) AS err_milli
      |  FROM folds)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_folds,
      |  CAST(sum(err_milli) // count(*) AS BIGINT) AS mae_milli,
      |  CAST(max(err_milli) AS BIGINT) AS max_err_milli
      |FROM scored GROUP BY 1 ORDER BY event_type""".stripMargin

  // B96 (r10): sequence-contiguity audit — the data-quality check
  // every "line N of M" column needs (invoice lines, page numbers,
  // shard indexes): per parent, are the child sequence numbers
  // exactly 1..n — no duplicates, no gaps? Closed-form per group from
  // four plain aggregates (count, distinct, min, max — dups = n −
  // distinct; gaps = span − distinct; contiguous ⇔ min=1 ∧ gaps=0 ∧
  // dups=0), then a four-class corpus rollup so the export is
  // CLASS-sized, never parent-sized (the A60 report discipline).
  // This synthetic lineitem genuinely reuses line numbers within an
  // order, so the audit reports real findings on both sides.
  def qSequenceAudit(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("ln")).as("nd"),
        min(col("ln")).as("mn"), max(col("ln")).as("mx"))
      .select(col("l_orderkey"),
        (col("n") - col("nd")).as("dups"),
        (col("mx") - col("mn") + 1 - col("nd")).as("gaps"),
        (col("mn") === 1 && col("n") === col("nd") &&
          col("mx") === col("nd")).as("contiguous"))
      .groupBy(col("contiguous"), (col("dups") > 0).as("has_dups"),
        (col("gaps") > 0).as("has_gaps"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("dups")).as("total_dups"),
        sum(col("gaps")).as("total_gaps"),
        min(col("l_orderkey")).as("example_order"))
      .orderBy("contiguous", "has_dups", "has_gaps")

  private val oSequenceAudit =
    """WITH per AS (
      |  SELECT l_orderkey,
      |    count(*) - count(DISTINCT l_linenumber) AS dups,
      |    max(l_linenumber) - min(l_linenumber) + 1
      |      - count(DISTINCT l_linenumber) AS gaps,
      |    (min(l_linenumber) = 1
      |     AND count(*) = count(DISTINCT l_linenumber)
      |     AND max(l_linenumber) = count(DISTINCT l_linenumber))
      |      AS contiguous
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT contiguous, dups > 0 AS has_dups, gaps > 0 AS has_gaps,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(dups) AS BIGINT) AS total_dups,
      |  CAST(sum(gaps) AS BIGINT) AS total_gaps,
      |  min(l_orderkey) AS example_order
      |FROM per GROUP BY 1, 2, 3
      |ORDER BY contiguous, has_dups, has_gaps""".stripMargin

  // B94 (r10): chi-squared contingency audit — "are priority and
  // status independent?" (the segmentation-vs-outcome association
  // check every experimentation/reporting stack runs). Exact integer
  // re-expression of Σ (O−E)²/E: with E = rt·ct/N, each cell's term
  // scales to ((O·N − rt·ct)² div (rt·ct)) · 10⁶ div N — an integer
  // division chain both engines execute identically (the div-order is
  // part of the contract; magnitudes stay < 2⁶³ at bench SF because
  // the square lands before the 10⁶ scale). One hash agg for cells,
  // two config-sized margin aggs broadcast back — the contingency
  // table is |priorities × statuses| regardless of row count.
  def qChiSquared(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d).select(col("o_orderpriority").as("p"),
      col("o_orderstatus").as("st"))
    val cells = o.groupBy("p", "st").agg(count(lit(1)).as("obs"))
    val rt = o.groupBy("p").agg(count(lit(1)).as("rt"))
    val ct = o.groupBy("st").agg(count(lit(1)).as("ct"))
    val n = o.agg(count(lit(1)).as("n"))
    cells.join(broadcast(rt), "p").join(broadcast(ct), "st")
      .crossJoin(broadcast(n))
      .select(col("p"), col("st"), col("obs"),
        expr("rt * ct * 1000L div n").as("expected_milli"),
        expr("((obs * n - rt * ct) * (obs * n - rt * ct) div (rt * ct)) " +
          "* 1000000L div n").as("chi_micro"))
      .orderBy("p", "st")
  }

  private val oChiSquared =
    """WITH o AS (
      |  SELECT o_orderpriority AS p, o_orderstatus AS st FROM orders),
      |cells AS (SELECT p, st, CAST(count(*) AS BIGINT) AS obs
      |          FROM o GROUP BY p, st),
      |rt AS (SELECT p, CAST(count(*) AS BIGINT) AS rt FROM o GROUP BY p),
      |ct AS (SELECT st, CAST(count(*) AS BIGINT) AS ct FROM o GROUP BY st),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o)
      |SELECT p, st, obs,
      |  rt * ct * 1000 // n AS expected_milli,
      |  ((obs * n - rt * ct) * (obs * n - rt * ct) // (rt * ct))
      |    * 1000000 // n AS chi_micro
      |FROM cells JOIN rt USING (p) JOIN ct USING (st) CROSS JOIN n
      |ORDER BY p, st""".stripMargin

  // B95 (r10): time-decayed scoring — the recency-weighted feature
  // every engagement/churn model starts from: weight halves every 180
  // days of age. The decay is a RIGHT SHIFT (cents >> (age div 180),
  // capped at 40): exact integer arithmetic, no float pow in the
  // contract, and the map-side expression keeps the whole thing one
  // scan + one join + one hash agg. As-of date is a fixed literal
  // AFTER all data (ages stay ≥ 0 — the B89 truncate-vs-floor
  // discipline).
  def qDecayWindow(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d).select(col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      least(expr("datediff(date'1999-01-01', o_orderdate) div 180"), lit(40L))
        .as("sh"))
      .select(col("o_custkey"), expr("shiftright(cents, CAST(sh AS INT))")
        .as("decayed"), col("cents"))
    val c = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("decayed")).as("decayed_cents"),
        sum(col("cents")).as("raw_cents"))
      .orderBy("c_mktsegment")
  }

  private val oDecayWindow =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    least(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
      |      // 180, 40) AS sh
      |  FROM orders)
      |SELECT c.c_mktsegment,
      |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(o.cents >> sh) AS BIGINT) AS decayed_cents,
      |  CAST(sum(o.cents) AS BIGINT) AS raw_cents
      |FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // B88 (r10): exponentially weighted moving average — the classic
  // time-series smoother (metric dashboards, anomaly baselines) that
  // plain window sums cannot express because the weight depends on
  // BOTH the summed row and the current row. Re-expression: one hash
  // agg collects each key's ordered (ts, id, value) series, then a
  // codegen'd `aggregate` fold runs the recurrence s ← s/2 + v/2 —
  // sequential per KEY but embarrassingly parallel across keys,
  // which is the right shape at 100 TB (a per-key series fits memory
  // long before the corpus does; state ∝ one group's events). α is
  // FIXED at 1/2 so every multiply is a power-of-two scale — exact
  // in binary floating point — and the one rounding per addition
  // happens in the same order in any engine: the hash compare is
  // then bit-exact with DuckDB's list_reduce, no cents idiom needed.
  def qEwma(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("value"))
    ev.groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id"),
        col("value").as("v")))).as("arr"))
      .select(col("user_id"),
        size(col("arr")).cast("long").as("n_events"),
        expr("""aggregate(slice(transform(arr, x -> x.v), 2, size(arr) - 1),
                          element_at(transform(arr, x -> x.v), 1),
                          (acc, x) -> acc * 0.5d + x * 0.5d)""").as("ewma"))
      .orderBy("user_id")
  }

  private val oEwma =
    """WITH s AS (
      |  SELECT user_id, list(value ORDER BY epoch_us(ts), event_id) AS vals
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id)
      |SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
      |  list_reduce(vals, (acc, x) ->
      |    acc * CAST(0.5 AS DOUBLE) + x * CAST(0.5 AS DOUBLE)) AS ewma
      |FROM s ORDER BY user_id""".stripMargin

  def qTimeWeighted(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).filter(col("user_id") % 10 === 0)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_s", expr("(next_us - ts_us) div 1000000"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum("dur_s").as("held_s"),
        sum(col("dur_s") * col("cents")).as("weight_cents_s"))
      .filter(col("held_s") > 0)
      .withColumn("twa",
        round(col("weight_cents_s") / (lit(100.0) * col("held_s")), 6))
      .orderBy("user_id")
  }

  private val oTimeWeighted =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE user_id % 10 = 0),
      |seg AS (
      |  SELECT user_id, cents,
      |    (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |      - ts_us) // 1000000 AS dur_s
      |  FROM ev),
      |agg AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_segments,
      |    CAST(sum(dur_s) AS BIGINT) AS held_s,
      |    CAST(sum(dur_s * cents) AS BIGINT) AS weight_cents_s
      |  FROM seg WHERE dur_s IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_segments, held_s, weight_cents_s,
      |  round(weight_cents_s / (100.0 * held_s), 6) AS twa
      |FROM agg WHERE held_s > 0 ORDER BY user_id""".stripMargin

  // B55 (r8): native session windows — Spark's `session_window(ts,
  // gap)` grouping operator (the engine-level form of what B14
  // computes with explicit windows: dynamic-length sessions that
  // extend while events arrive within the gap). Session end = last
  // event + gap by definition; two events merge iff the later one
  // starts strictly before the earlier window's end (diff < gap).
  // The oracle re-derives the identical sessions with the manual
  // gap-island construction — gating Spark's operator against first
  // principles. Plans as one MergingSessions aggregation: a sort
  // within partitions by (key, start), partial merge map-side — no
  // per-event window state.
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("tsv"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), session_window(col("tsv"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents_sum"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("cents_sum"))
      .orderBy("user_id", "session_start_us")

  private val oSessionWindow =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, cents,
      |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
      |      ORDER BY ts_us) >= 3600000000 THEN 1 ELSE 0 END AS brk
      |  FROM ev),
      |sess AS (
      |  SELECT user_id, ts_us, cents,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |  CAST(min(ts_us) AS BIGINT) AS session_start_us,
      |  CAST(max(ts_us) + 3600000000 AS BIGINT) AS session_end_us,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS cents_sum
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  // B56 (r8): column profiling — the ANALYZE/data-quality scan behind
  // every ingestion dashboard: per column, row count, null count,
  // exact distinct count, and min/max (string-rendered so one schema
  // serves every type). ONE aggregation pass over one scan computes
  // all 4 columns × 4 measures (Spark expands the multi-distinct into
  // grouping-id form — still a single scan); the per-column rows are
  // then exploded from the 1-row aggregate, not re-scanned. A
  // nullable column is derived (k NULL on every 7th event) so the
  // null accounting is non-vacuous; at 100 TB the distinct counts
  // would swap to HLL (B18's gated bound) — declared.
  def qProfile(s: SparkSession, d: String): DataFrame = {
    val base = T.events(s, d).select(col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"),
      when(col("event_id") % 7 =!= 0,
        get_json_object(col("props"), "$.k").cast("long")).as("k7"))
    val cols = Seq("user_id", "event_type", "cents", "k7")
    val measures = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val one = base.agg(measures.head, measures.tail: _*)
    val rows = cols.map(c => struct(lit(c).as("column"), col("n"),
      (col("n") - col(s"cnt_$c")).as("n_null"),
      col(s"nd_$c").as("n_distinct"),
      col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s")))
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("column")
  }

  private val oProfile =
    """WITH base AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN event_id % 7 <> 0
      |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k7
      |  FROM events)
      |SELECT 'cents' AS "column", CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) - count(cents) AS BIGINT) AS n_null,
      |  CAST(count(DISTINCT cents) AS BIGINT) AS n_distinct,
      |  CAST(min(cents) AS VARCHAR) AS min_s, CAST(max(cents) AS VARCHAR) AS max_s
      |FROM base
      |UNION ALL
      |SELECT 'event_type', CAST(count(*) AS BIGINT),
      |  CAST(count(*) - count(event_type) AS BIGINT),
      |  CAST(count(DISTINCT event_type) AS BIGINT),
      |  min(event_type), max(event_type) FROM base
      |UNION ALL
      |SELECT 'k7', CAST(count(*) AS BIGINT),
      |  CAST(count(*) - count(k7) AS BIGINT),
      |  CAST(count(DISTINCT k7) AS BIGINT),
      |  CAST(min(k7) AS VARCHAR), CAST(max(k7) AS VARCHAR) FROM base
      |UNION ALL
      |SELECT 'user_id', CAST(count(*) AS BIGINT),
      |  CAST(count(*) - count(user_id) AS BIGINT),
      |  CAST(count(DISTINCT user_id) AS BIGINT),
      |  CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR) FROM base
      |ORDER BY "column"""".stripMargin

  // B57 (r8): error-safe `try_*` arithmetic — the ANSI-safety surface
  // (try_divide / try_cast / try_element_at / try_add / try_multiply):
  // each returns NULL where strict evaluation would raise (divide by
  // zero, malformed cast, out-of-bounds index, BIGINT overflow),
  // INDEPENDENT of spark.sql.ansi.enabled — the contract that lets a
  // 100 TB scan survive one bad row instead of dying at task 94 312.
  // All per-row codegen'd scalar work on one pruned scan. Every NULL
  // branch is non-vacuous by construction (den hits 0 every third
  // line, every fourth partkey's string is unparseable, the probe
  // index overruns 7-line orders, overflow toggles on partkey
  // arithmetic). The oracle re-expresses each guard explicitly —
  // NULLIF, TRY_CAST, bounds CASE, and HUGEINT-widened overflow
  // checks (computed in HUGEINT so DuckDB's eager vectorized CASE
  // branches cannot themselves overflow) — so an engine that wraps,
  // errors, or mis-rounds any edge breaks the hash. safe_div stays
  // exact: the surviving denominators are 1 and 2, every quotient a
  // dyadic rational.
  def qTryFuncs(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(cents, l_linenumber % 3)").as("safe_div"),
        expr("try_cast(CASE WHEN l_partkey % 4 = 0 THEN concat('x', l_partkey) " +
          "ELSE cast(l_partkey AS string) END AS bigint)").as("safe_cast"),
        expr("cast(try_element_at(sequence(1, l_linenumber), " +
          "cast(l_suppkey % 9 + 1 AS int)) AS bigint)").as("safe_elem"),
        expr("try_add(9223372036854775807 - l_partkey % 10, " +
          "cast(l_linenumber AS bigint))").as("safe_add"),
        expr("try_multiply(4611686018427387903 + l_partkey % 3, 2L)").as("safe_mul"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val oTryFuncs =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(cents AS DOUBLE) / nullif(l_linenumber % 3, 0) AS safe_div,
      |  TRY_CAST(CASE WHEN l_partkey % 4 = 0 THEN 'x' || l_partkey
      |           ELSE CAST(l_partkey AS VARCHAR) END AS BIGINT) AS safe_cast,
      |  CAST(list_extract(range(1, l_linenumber + 1), l_suppkey % 9 + 1) AS BIGINT) AS safe_elem,
      |  CAST(CASE WHEN l_linenumber <= l_partkey % 10
      |       THEN CAST(9223372036854775807 AS HUGEINT) - (l_partkey % 10) + l_linenumber
      |       END AS BIGINT) AS safe_add,
      |  CAST(CASE WHEN l_partkey % 3 = 0
      |       THEN (CAST(4611686018427387903 AS HUGEINT) + (l_partkey % 3)) * 2
      |       END AS BIGINT) AS safe_mul
      |FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |      FROM lineitem WHERE l_orderkey % 50 = 0) t
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // B59 (r9): market-basket frequent pairs — the co-occurrence /
  // association-rule surface (support, directional confidence, lift)
  // every retail/affinity warehouse serves. Baskets are orders, items
  // are distinct parts per order; the candidate pass is the classic
  // within-basket self-join (shuffle ON the basket key, per-basket
  // work C(n,2) — bounded by the basket-size cap the data model
  // enforces; a heavy-tailed catalog would pre-cap items per basket,
  // declared, before the quadratic step). All rule metrics are
  // integer ppm (truncating DIV — engine-exact); the 1-row basket
  // total joins by broadcast (declared stats crossJoin), item counts
  // by broadcast hash join on the part key.
  def qBasketPairs(s: SparkSession, d: String): DataFrame = {
    // r15 (guide §1.2): the distinct-(basket, item) relation feeds FOUR
    // consumers (both self-join sides, the per-item counts, the basket
    // total) and the alias-renamed subtrees defeated exchange reuse —
    // JobProbe showed the distinct's map side executing 3×. Checkpoint
    // it once; it is the compacted basket-item incidence (≤ one row
    // per (order, part)), strictly smaller than lineitem.
    val items = T.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .localCheckpoint(true)
    val totals = items.agg(countDistinct("ok").as("n_baskets"))
    val itemCnt = items.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(broadcast(itemCnt.select(col("pk").as("pa"), col("n_item").as("n_a"))), "pa")
      .join(broadcast(itemCnt.select(col("pk").as("pb"), col("n_item").as("n_b"))), "pb")
      .crossJoin(broadcast(totals))
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000000L DIV n_baskets").as("support_ppm"),
        expr("n_ab * 1000000L DIV n_a").as("conf_ab_ppm"),
        expr("n_ab * 1000000L DIV n_b").as("conf_ba_ppm"),
        expr("(n_ab * n_baskets * 1000000L) DIV (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("n_ab").desc, col("pa"), col("pb"))
  }

  private val oBasketPairs =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
      |cnt AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM items GROUP BY pk),
      |pairs AS (
      |  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_ab
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY a.pk, b.pk HAVING count(*) >= 2)
      |SELECT pa, pb, n_ab, ca.n_item AS n_a, cb.n_item AS n_b,
      |  n_ab * 1000000 // n_baskets AS support_ppm,
      |  n_ab * 1000000 // ca.n_item AS conf_ab_ppm,
      |  n_ab * 1000000 // cb.n_item AS conf_ba_ppm,
      |  (n_ab * n_baskets * 1000000) // (ca.n_item * cb.n_item) AS lift_ppm
      |FROM pairs
      |JOIN cnt ca ON ca.pk = pa
      |JOIN cnt cb ON cb.pk = pb
      |CROSS JOIN tot
      |ORDER BY n_ab DESC, pa, pb""".stripMargin

  // B60 (r9): ordered funnel analysis — the product-analytics staple
  // (view → click → purchase, each step strictly AFTER the previous
  // one for the same user). The stage chain is the standard
  // peel-off: stage k+1 = one type-filtered scan joined to stage k's
  // per-user frontier timestamp (shuffle on user_id, frontier rows ∝
  // users — broadcastable for selective funnels), min-agg back to a
  // frontier. No per-user event sorting, no collect_list of event
  // streams. Conversion rates in integer ppm; time-to-convert sums
  // in exact µs.
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2.select("user_id", "t2"), "user_id").filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"), min("t2").as("t2"))
    val n1 = s1.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_click"),
        sum(col("t2") - col("t1")).as("us_view_to_click"))))
      .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_purchase"),
        sum(col("t3") - col("t2")).as("us_click_to_purchase"))))
    n1.select(col("n_view"), col("n_click"), col("n_purchase"),
      expr("n_click * 1000000L DIV n_view").as("conv_click_ppm"),
      expr("n_purchase * 1000000L DIV n_click").as("conv_purchase_ppm"),
      col("us_view_to_click"), col("us_click_to_purchase"))
  }

  private val oFunnel =
    """WITH s1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(s1.t1) AS t1
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(s2.t2) AS t2
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      |  GROUP BY e.user_id)
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
      |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
      |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
      |  (SELECT count(*) FROM s2) * 1000000
      |    // (SELECT count(*) FROM s1) AS conv_click_ppm,
      |  (SELECT count(*) FROM s3) * 1000000
      |    // (SELECT count(*) FROM s2) AS conv_purchase_ppm,
      |  (SELECT CAST(sum(t2 - t1) AS BIGINT) FROM s2) AS us_view_to_click,
      |  (SELECT CAST(sum(t3 - t2) AS BIGINT) FROM s3) AS us_click_to_purchase""".stripMargin

  // B61 (r9): retention cohorts — the other product-analytics staple:
  // users cohorted by first-seen epoch-week (pure integer µs DIV
  // week, no calendar functions in the contract), then each cohort's
  // distinct active users at week offsets 0..3. One per-user min-agg
  // builds the cohort map (shuffle ∝ users), one join stamps events
  // with their cohort (shuffle ∝ events), one distinct-agg builds the
  // matrix (∝ cohorts × offsets). Retention in integer ppm of the
  // cohort size.
  def qRetention(s: SparkSession, d: String): DataFrame = {
    val wk = 604800000000L
    val ev = T.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $wk").as("w"))
    val cohort = ev.groupBy("user_id").agg(min("w").as("c0"))
    val sizes = cohort.groupBy("c0").agg(count(lit(1)).as("cohort_size"))
    ev.join(cohort, "user_id")
      .withColumn("week_offset", col("w") - col("c0"))
      .filter(col("week_offset") <= 3)
      .groupBy("c0", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), "c0")
      .select(col("c0").as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        expr("n_active * 1000000L DIV cohort_size").as("retention_ppm"))
      .orderBy("cohort_week", "week_offset")
  }

  private val oRetention =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS w FROM events),
      |cohort AS (SELECT user_id, min(w) AS c0 FROM ev GROUP BY user_id),
      |sizes AS (SELECT c0, CAST(count(*) AS BIGINT) AS cohort_size
      |          FROM cohort GROUP BY c0),
      |m AS (
      |  SELECT c.c0, e.w - c.c0 AS week_offset,
      |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
      |  WHERE e.w - c.c0 <= 3 GROUP BY c.c0, e.w - c.c0)
      |SELECT m.c0 AS cohort_week, m.week_offset, m.n_active, s.cohort_size,
      |  m.n_active * 1000000 // s.cohort_size AS retention_ppm
      |FROM m JOIN sizes s ON m.c0 = s.c0
      |ORDER BY cohort_week, week_offset""".stripMargin

  // B62 (r9): event-sequence pattern matching — MATCH_RECOGNIZE-lite
  // (the SQL:2016 row-pattern operator Spark lacks; Flink/Trino/Oracle
  // serve it natively). Pattern here: view (click)+ purchase,
  // CONTIGUOUS in the per-user ordered stream (strictly stronger than
  // B60's funnel, which allows arbitrary interleaving), with AFTER
  // MATCH SKIP semantics given by segmenting at every 'view'. The
  // re-expression: one per-user running count of 'view' rows assigns
  // every event a segment id (window over the user partition — the
  // same shuffle any per-user op pays); per segment, the ordered
  // type-initial string is built with the B30 sort_array/concat_ws
  // idiom and the pattern becomes an anchored REGEX on that string —
  // '^vc+p' — whose match length locates the closing purchase, joined
  // back by within-segment row_number to price the span in exact µs.
  // Scale shape: segment strings are bounded by inter-view gaps (a
  // pathological no-view firehose would cap the collect, declared);
  // everything else is hash aggs and one key join ∝ events. Ties in
  // the stream order break by event_id, so the symbol string — and
  // therefore every match — is engine-deterministic.
  def qEventPattern(s: SparkSession, d: String): DataFrame =
    eventPatternMatches(T.events(s, d).select(col("user_id"),
      col("event_id"), expr("ts div 1000").as("us"),
      expr("substring(event_type, 1, 1)").as("sym")))

  /** B62 core over a (user_id, event_id, us, sym) stream — separated
    * so laws can plant exact sequences. See [[qEventPattern]].
    */
  def eventPatternMatches(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = ev.withColumn("seg",
        sum(when(col("sym") === "v", 1L).otherwise(0L)).over(w))
      .filter(col("seg") >= 1)
    val wseg = Window.partitionBy("user_id", "seg").orderBy("us", "event_id")
    val pos = seg.withColumn("rn", row_number().over(wseg))
    val segs = pos.groupBy("user_id", "seg").agg(
      concat_ws("", transform(
        array_sort(collect_list(struct(col("us"), col("event_id"), col("sym")))),
        x => x.getField("sym"))).as("symstr"),
      min("us").as("t_start"))
    val m = segs.withColumn("mlen",
      length(regexp_extract(col("symstr"), "^vc+p", 0)))
    val ends = m.filter(col("mlen") >= 3)
      .join(pos.select("user_id", "seg", "rn", "us"), Seq("user_id", "seg"))
      .filter(col("rn") === col("mlen"))
    val agg = ends.groupBy("user_id").agg(
      count(lit(1)).as("n_matches"),
      sum(col("mlen") - 2).as("n_clicks_matched"),
      sum(col("us") - col("t_start")).as("span_us"))
    segs.groupBy("user_id").agg(count(lit(1)).as("n_segments"))
      .join(agg, Seq("user_id"), "left")
      .select(col("user_id"), col("n_segments"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("n_clicks_matched"), lit(0L)).as("n_clicks_matched"),
        coalesce(col("span_us"), lit(0L)).as("span_us"))
      .orderBy("user_id")
  }

  private val oEventPattern =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    substr(event_type, 1, 1) AS sym FROM events),
      |seg AS (
      |  SELECT *, sum(CASE WHEN sym = 'v' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY us, event_id
      |          ROWS UNBOUNDED PRECEDING) AS seg
      |  FROM ev),
      |pos AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, seg
      |                               ORDER BY us, event_id) AS rn
      |  FROM seg WHERE seg >= 1),
      |segs AS (
      |  SELECT user_id, seg,
      |    string_agg(sym, '' ORDER BY us, event_id) AS symstr,
      |    min(us) AS t_start
      |  FROM pos GROUP BY user_id, seg),
      |m AS (
      |  SELECT user_id, seg, t_start,
      |    length(coalesce(regexp_extract(symstr, '^vc+p'), '')) AS mlen
      |  FROM segs),
      |ends AS (
      |  SELECT m.user_id AS uid, m.mlen, p.us - m.t_start AS span
      |  FROM m JOIN pos p
      |    ON p.user_id = m.user_id AND p.seg = m.seg AND p.rn = m.mlen
      |  WHERE m.mlen >= 3),
      |agg AS (
      |  SELECT uid, CAST(count(*) AS BIGINT) AS n_matches,
      |    CAST(sum(mlen - 2) AS BIGINT) AS n_clicks_matched,
      |    CAST(sum(span) AS BIGINT) AS span_us
      |  FROM ends GROUP BY uid),
      |su AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_segments
      |       FROM segs GROUP BY user_id)
      |SELECT su.user_id, su.n_segments,
      |  coalesce(a.n_matches, 0) AS n_matches,
      |  coalesce(a.n_clicks_matched, 0) AS n_clicks_matched,
      |  coalesce(a.span_us, 0) AS span_us
      |FROM su LEFT JOIN agg a ON su.user_id = a.uid
      |ORDER BY user_id""".stripMargin

  // B63 (r9): rolling robust anomaly detection — the metric-stream
  // outlier screen (median + MAD over a trailing window, the robust
  // replacement for mean/σ that one spike can't poison). Spark has no
  // EXACT windowed median (percentile_approx only); the re-expression
  // materializes the 21-row trailing frame with collect_list over a
  // ROWS window, sorts it, and indexes the lower median — per-row
  // work O(w log w) with w=21 declared, all codegen'd array
  // functions, the window shuffle is the same per-key sort any
  // rolling op pays. Values are exact cents (round(value*100) — the
  // established integer-cents idiom) so median, MAD, and the 5×MAD
  // verdict are pure BIGINT decisions; both engines index the SAME
  // sorted multiset so lower-median ties are engine-exact. MAD=0
  // frames (constant history) never flag — the standard guard.
  def qAnomalyMad(s: SparkSession, d: String): DataFrame =
    rollingMadAnomalies(T.events(s, d).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v_c")))
      .orderBy("event_id")

  /** B63 core over a (user_id, event_id, us, v_c) stream — separated
    * so laws can plant exact windows. See [[qAnomalyMad]].
    */
  def rollingMadAnomalies(ev: DataFrame, window: Int = 20,
      k: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(-window, Window.currentRow)
    ev.withColumn("f", sort_array(collect_list(col("v_c")).over(w)))
      .withColumn("med_c",
        expr("element_at(f, CAST((size(f) + 1) div 2 AS INT))"))
      .withColumn("mad_c", expr(
        "element_at(array_sort(transform(f, x -> abs(x - med_c)))," +
          " CAST((size(f) + 1) div 2 AS INT))"))
      .select(col("user_id"), col("event_id"), col("v_c"), col("med_c"),
        col("mad_c"),
        (abs(col("v_c") - col("med_c")) > lit(k) * col("mad_c") &&
          col("mad_c") > 0).as("is_anomaly"))
  }

  private val oAnomalyMad =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
      |f AS (
      |  SELECT user_id, event_id, v_c,
      |    list_sort(list(v_c) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)) AS fr
      |  FROM ev),
      |m AS (SELECT *, fr[(len(fr) + 1) // 2] AS med_c FROM f),
      |d AS (SELECT *,
      |  list_sort(list_transform(fr, x -> abs(x - med_c)))[(len(fr) + 1) // 2]
      |    AS mad_c FROM m)
      |SELECT user_id, event_id, v_c, med_c, mad_c,
      |  (abs(v_c - med_c) > 5 * mad_c AND mad_c > 0) AS is_anomaly
      |FROM d ORDER BY event_id""".stripMargin

  // B64 (r9): A/B experiment analysis — the experimentation readout
  // every product warehouse serves: deterministic variant assignment
  // (the engine-portable ppm id bucket with the LARGE multiplier —
  // the 1e6-scale multiplier fails to equidistribute sequential ids,
  // see C34's note), per-variant exposure/conversion counts
  // (conversion = a purchase strictly after the user's FIRST view —
  // exposure-gated, B60's peel-off shape), and the 2×2 chi-square
  // statistic kept EXACT: χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is a
  // ratio of count products, so chi2_milli is computed as
  // q·1000 + (r·1000) DIV den with (q, r) = divmod(num, den) — pure
  // BIGINT at any realistic cell size, no float variance formula.
  // Scale shape: one per-user min-agg + one distinct semi-side (both
  // shuffle ∝ users), then a single 1-row global agg; the statistic
  // is driver-sized arithmetic ON that row.
  def qExperimentAb(s: SparkSession, d: String): DataFrame =
    experimentAb(T.events(s, d).select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("us")))

  /** B64 core over a (user_id, event_type, us) stream — separated so
    * laws can plant exact 2×2 tables. See [[qExperimentAb]].
    */
  def experimentAb(ev: DataFrame): DataFrame = {
    val exposed = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t0"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(exposed, "user_id").filter(col("us") > col("t0"))
      .select("user_id").distinct().withColumn("cv", lit(1L))
    exposed.join(conv, Seq("user_id"), "left")
      .select(col("user_id"), coalesce(col("cv"), lit(0L)).as("converted"))
      .withColumn("va",
        expr("(user_id * 554862419L) % 1000000 < 500000"))
      .agg(
        sum(when(col("va"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("va"), col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(!col("va"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("va"), col("converted")).otherwise(0L)).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("conv_a * 1000000L DIV n_a").as("rate_a_ppm"),
        expr("conv_b * 1000000L DIV n_b").as("rate_b_ppm"),
        expr("conv_a * 1000000L DIV n_a - conv_b * 1000000L DIV n_b")
          .as("diff_ppm"),
        expr("""(n_a + n_b) * (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b)
                * (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b)
                DIV greatest(n_a * n_b * (conv_a + conv_b)
                             * (n_a - conv_a + n_b - conv_b), 1L) * 1000L
              + ((n_a + n_b) * (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b)
                 * (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b)
                 % greatest(n_a * n_b * (conv_a + conv_b)
                            * (n_a - conv_a + n_b - conv_b), 1L)) * 1000L
                DIV greatest(n_a * n_b * (conv_a + conv_b)
                             * (n_a - conv_a + n_b - conv_b), 1L)""")
          .as("chi2_milli"))
  }

  private val oExperimentAb =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |exposed AS (
      |  SELECT user_id, min(us) AS t0 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |conv AS (
      |  SELECT DISTINCT e.user_id FROM ev e JOIN exposed x USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.us > x.t0),
      |base AS (
      |  SELECT x.user_id,
      |    CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS converted,
      |    (x.user_id * 554862419) % 1000000 < 500000 AS va
      |  FROM exposed x LEFT JOIN conv c ON x.user_id = c.user_id),
      |agg AS (
      |  SELECT
      |    CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN va THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN NOT va THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM base),
      |m AS (
      |  SELECT *,
      |    (n_a + n_b) AS nn,
      |    (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b) AS det,
      |    greatest(n_a * n_b * (conv_a + conv_b)
      |             * (n_a - conv_a + n_b - conv_b), 1) AS den
      |  FROM agg)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  conv_a * 1000000 // n_a AS rate_a_ppm,
      |  conv_b * 1000000 // n_b AS rate_b_ppm,
      |  conv_a * 1000000 // n_a - conv_b * 1000000 // n_b AS diff_ppm,
      |  (nn * det * det // den) * 1000
      |    + ((nn * det * det % den) * 1000) // den AS chi2_milli
      |FROM m""".stripMargin

  // B101 (r11): trailing-window distinct actives (the WAU curve —
  // for every calendar day, how many users had ≥1 event in the
  // trailing 7 days). The naive forms don't scale: a sliding
  // `count(DISTINCT)` window doesn't exist, and exploding each
  // user-day into its 7 covered days is a ×W blowup. Pair-free shape:
  // distinct user-days → per-user ISLANDS (consecutive days < W
  // apart — their [day, day+W−1] coverages overlap, so counting them
  // separately would double-count the user; a gap ≥ W means disjoint
  // coverage and a clean new interval) → each island [s, e] emits
  // sweep boundaries +1@s / −1@(e+W) → one calendar-bounded running
  // sum (the B91/B99 sweep core).
  //
  // Scale shape: distinct ∝ user-days, island windows partitioned BY
  // USER (parallel across users, state ∝ one user's days), boundary
  // agg ∝ islands; only the final sweep is single-partition and it is
  // bounded by the CALENDAR, never by traffic.
  def qWindowActives(s: SparkSession, d: String): DataFrame =
    windowActives(T.events(s, d)
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .distinct(), 7)

  /** B101 core over a distinct (user_id, day) relation — separated so
    * laws can plant exact gap/overlap cases. See [[qWindowActives]].
    */
  def windowActives(userDays: DataFrame, window: Int): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy("day")
    val islands = userDays
      .withColumn("prev", lag("day", 1).over(wUser))
      .withColumn("brk",
        (col("prev").isNull || col("day") - col("prev") >= window).cast("long"))
      .withColumn("island",
        sum("brk").over(wUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "island")
      .agg(min("day").as("s"), max("day").as("e"))
    // two consumers (calendar bounds + the sweep join) — materialize
    // the island-sized boundary relation once instead of re-running
    // the corpus distinct+windows per consumer; the calendar derives
    // from the boundaries themselves (min start / max end+W), so the
    // whole operator is ONE corpus pass
    val bounds = islands.select(explode(array(
        struct(col("s").as("day"), lit(1L).as("w")),
        struct((col("e") + window).as("day"), lit(-1L).as("w")))).as("b"))
      .select(col("b.day"), col("b.w"))
      .groupBy("day").agg(sum("w").as("net"))
      .localCheckpoint(true)
    val cal = bounds.agg(min("day").as("d0"), max("day").as("d1x"))
      .select(explode(expr("sequence(d0, d1x - 1)")).as("day"))
    val sweep = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cal.join(bounds, Seq("day"), "left")
      .withColumn("actives", sum(coalesce(col("net"), lit(0L))).over(sweep))
      .select(col("day"), col("actives"))
      .orderBy("day")
  }

  private val oWindowActives =
    """WITH e AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      |cal AS (SELECT CAST(d AS BIGINT) AS day
      |        FROM b, unnest(range(d0, d1 + 7)) AS t(d))
      |SELECT c.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS actives
      |FROM cal c LEFT JOIN e ON e.day BETWEEN c.day - 6 AND c.day
      |GROUP BY c.day ORDER BY c.day""".stripMargin

  // B100 (r11): Mann–Whitney U rank-sum test — the NONPARAMETRIC
  // two-sample comparison B64's chi-square (binary conversion) and a
  // t-test (normality assumption) don't give: does variant A's
  // per-user activity stochastically dominate B's? Exact integers
  // under ties via DOUBLED average ranks: a tie group spanning
  // positions [s, s+t−1] has avg rank s+(t−1)/2, so rank2 = 2s+t−1 =
  // 2·cum − cnt + 1 is always integral; U2 = 2U = R2_a − n_a(n_a+1),
  // and U_a/(n_a·n_b) IS the AUC / rank-biserial effect size
  // ("probability a random A user out-actives a random B user"),
  // exported in exact ppm. Law U2_a + U2_b = 2·n_a·n_b by
  // construction.
  //
  // Scale shape: one shuffle ∝ users (per-user metric), one hash agg
  // ∝ DISTINCT metric values, then the only window runs over that
  // value-level relation — |distinct activity counts| rows, the
  // declared driver-sized report state, never per-user. Σ cnt·rank2 ≤
  // 2N² stays Long-safe past 10⁹ users.
  def qMannWhitney(s: SparkSession, d: String): DataFrame =
    mannWhitney(T.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("v"))
      .select(col("v"),
        expr("(user_id * 554862419L) % 1000000 < 500000").as("va")))

  /** B100 core over a (v, va) relation — separated so laws can plant
    * exact rank tables. See [[qMannWhitney]].
    */
  def mannWhitney(obs: DataFrame): DataFrame = {
    val byValue = obs.groupBy("v").agg(
      sum(when(col("va"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("va"), 1L).otherwise(0L)).as("cnt_b"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    byValue
      .withColumn("cnt", col("cnt_a") + col("cnt_b"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("rank2", expr("2L * cum - cnt + 1L"))
      .agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"),
        sum(expr("cnt_a * rank2")).as("r2_a"))
      .select(col("n_a"), col("n_b"), col("r2_a"),
        expr("r2_a - n_a * (n_a + 1L)").as("u2_a"),
        expr("2L * n_a * n_b - (r2_a - n_a * (n_a + 1L))").as("u2_b"),
        expr("(r2_a - n_a * (n_a + 1L)) * 1000000L DIV (2L * n_a * n_b)")
          .as("auc_a_ppm"))
  }

  private val oMannWhitney =
    """WITH m AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS v,
      |    (user_id * 554862419) % 1000000 < 500000 AS va
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
      |    CAST(sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      |  FROM m GROUP BY v),
      |r AS (
      |  SELECT *, cnt_a + cnt_b AS cnt,
      |    CAST(sum(cnt_a + cnt_b) OVER (ORDER BY v) AS BIGINT) AS cum
      |  FROM g),
      |k AS (SELECT *, 2 * cum - cnt + 1 AS rank2 FROM r),
      |agg AS (
      |  SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
      |    CAST(sum(cnt_b) AS BIGINT) AS n_b,
      |    CAST(sum(cnt_a * rank2) AS BIGINT) AS r2_a
      |  FROM k)
      |SELECT n_a, n_b, r2_a,
      |  r2_a - n_a * (n_a + 1) AS u2_a,
      |  2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
      |  (r2_a - n_a * (n_a + 1)) * 1000000 // (2 * n_a * n_b) AS auc_a_ppm
      |FROM agg""".stripMargin

  // B65 (r9): period-over-period reporting — the week-over-week
  // revenue delta every BI layer serves. Weekly revenue as exact
  // integer cents (the established idiom), weeks as pure integer
  // epoch-µs DIV week (no calendar functions in the contract), the
  // delta as lag + ppm with truncation toward zero on BOTH engines
  // (verified: DuckDB `//` and Spark DIV agree on negatives). The
  // lag window is GLOBAL but post-aggregation — |weeks| rows, the
  // declared driver-sized report state, never per-order.
  def qPeriodOverPeriod(s: SparkSession, d: String): DataFrame =
    wowDeltas(T.orders(s, d)
      .select(expr(
        // o_orderdate is TIMESTAMP_NTZ; the session is pinned UTC, so
        // the cast matches DuckDB's epoch_us over the naive timestamp
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 604800000000")
        .as("week"),
        col("o_totalprice"))
      .groupBy("week")
      .agg(expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").as("rev_c"),
        count(lit(1)).as("n_orders")))
      .orderBy("week")

  /** B65 core over a (week, rev_c, n_orders) relation — separated so
    * laws can plant exact deltas. See [[qPeriodOverPeriod]].
    */
  def wowDeltas(weekly: DataFrame): DataFrame =
    weekly.withColumn("prev_rev_c",
        lag("rev_c", 1).over(Window.orderBy("week")))
      .withColumn("wow_ppm", expr(
        """CASE WHEN prev_rev_c IS NULL OR prev_rev_c = 0 THEN NULL
          |ELSE (rev_c - prev_rev_c) * 1000000L DIV prev_rev_c END"""
          .stripMargin))

  private val oPeriodOverPeriod =
    """WITH wk AS (
      |  SELECT epoch_us(o_orderdate) // 604800000000 AS week,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT week, rev_c, n_orders,
      |  lag(rev_c) OVER (ORDER BY week) AS prev_rev_c,
      |  CASE WHEN lag(rev_c) OVER (ORDER BY week) IS NULL
      |         OR lag(rev_c) OVER (ORDER BY week) = 0 THEN NULL
      |    ELSE (rev_c - lag(rev_c) OVER (ORDER BY week)) * 1000000
      |         // lag(rev_c) OVER (ORDER BY week) END AS wow_ppm
      |FROM wk ORDER BY week""".stripMargin

  // B66 (r9): click-path transition matrix — the first-order Markov
  // model of user navigation (product analytics' "where do users go
  // from X", the input to path-flow diagrams and next-step
  // prediction): per user, consecutive event pairs within a 30-min
  // session gap (lead over the per-user order — the same one-pass
  // window shape as B25, composed with B14's gap rule), then ONE
  // hash agg to the |types|² matrix with per-from-state totals
  // broadcast back for integer-ppm transition probabilities. Rows
  // whose successor is beyond the gap (or absent — last event per
  // user) emit nothing.
  def qPathTransitions(s: SparkSession, d: String): DataFrame =
    pathTransitions(T.events(s, d).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"), col("event_type")))

  /** B66 core over a (user_id, event_id, us, event_type) stream —
    * separated so laws can plant exact paths. See [[qPathTransitions]].
    */
  def pathTransitions(events: DataFrame,
      gapUs: Long = 1800000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val ev = events
      .withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("next_us", lead("us", 1).over(w))
      .filter(col("next_type").isNotNull &&
        col("next_us") - col("us") <= gapUs)
    val cells = ev.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("from_type").agg(sum("n").as("n_from"))
    cells.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("n * 1000000L DIV n_from").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  private val oPathTransitions =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS next_type,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |                             ORDER BY epoch_us(ts), event_id) AS next_us
      |  FROM events),
      |cells AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM ev
      |  WHERE next_type IS NOT NULL AND next_us - us <= 1800000000
      |  GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      |        FROM cells GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n, t.n_from,
      |  c.n * 1000000 // t.n_from AS p_ppm
      |FROM cells c JOIN tot t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // B67 (r9): equi-DEPTH histogram — the quantile-bucket summary B35's
  // equi-width version can't give on skewed money data (uniform-width
  // bins put 90% of orders in one bar). The textbook form is
  // ntile(10) OVER (ORDER BY v) — a single-task global window at any
  // scale. The scale-sound re-expression: decile BOUNDARIES from one
  // percentile_disc aggregate (ANSI discrete percentile — "smallest
  // value with cume_dist ≥ p", tie semantics verified identical in
  // DuckDB's quantile_disc), broadcast back as a 1-row stats
  // crossJoin (declared), bucket = codegen'd count of boundaries
  // strictly below the value (boundary-equal values fall LOW —
  // deterministic), then one hash agg. Money exact in integer cents.
  def qEquidepthHist(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
    // r14: one shared percentile buffer for all 9 boundaries (see
    // graft.functions.Percentiles) — was 9 independent value-map
    // buffers updated per input row; results bit-identical.
    val bounds = o.agg(graft.functions.Percentiles
      .percentileDiscArray(col("c"), (1 to 9).map(_ / 10.0)).as("bs"))
    o.crossJoin(broadcast(bounds))
      .select(col("c"), expr(
        "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN c > b THEN 1 ELSE 0 END)")
        .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("c").as("min_c"), max("c").as("max_c"),
        sum("c").as("sum_c"))
      .orderBy("bucket")
  }

  private val oEquidepthHist =
    """WITH o AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      |b AS (SELECT quantile_disc(c,
      |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM o)
      |SELECT CAST(len(list_filter(bs, x -> c > x)) AS INT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(c) AS min_c, max(c) AS max_c, CAST(sum(c) AS BIGINT) AS sum_c
      |FROM o, b GROUP BY 1 ORDER BY bucket""".stripMargin

  // B68 (r9): last-touch attribution — "which channel gets credit for
  // each purchase", the marketing-analytics staple: every purchase is
  // attributed to the user's most recent NON-purchase event within a
  // 1-hour lookback, else 'direct'. The lookback is ONE
  // last_value(IGNORE NULLS) window over the preceding frame (B51's
  // navigation surface composed with a per-row verdict) — no
  // self-join of purchases against the event stream; both engines'
  // IGNORE NULLS semantics are already pinned by B51. Share ppm via
  // a declared 1-row total crossJoin.
  def qAttribution(s: SparkSession, d: String): DataFrame =
    lastTouchAttribution(T.events(s, d).select(col("user_id"),
      col("event_id"), expr("ts div 1000").as("us"), col("event_type")))

  /** B68 core over a (user_id, event_id, us, event_type) stream —
    * separated so laws can plant exact touches. See [[qAttribution]].
    */
  def lastTouchAttribution(ev: DataFrame,
      lookbackUs: Long = 3600000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchUs = when(col("event_type") =!= "purchase", col("us"))
    val p = ev
      .withColumn("prev_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("prev_us", last(touchUs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("prev_type").isNotNull &&
          col("us") - col("prev_us") <= lookbackUs, col("prev_type"))
          .otherwise(lit("direct")))
    val cells = p.groupBy("channel").agg(count(lit(1)).as("n_purchases"))
    cells.crossJoin(broadcast(cells.agg(sum("n_purchases").as("total"))))
      .select(col("channel"), col("n_purchases"),
        expr("n_purchases * 1000000L DIV total").as("share_ppm"))
      .orderBy("channel")
  }

  private val oAttribution =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
      |    last_value(CASE WHEN event_type <> 'purchase'
      |        THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_type,
      |    last_value(CASE WHEN event_type <> 'purchase'
      |        THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us
      |  FROM events),
      |p AS (
      |  SELECT CASE WHEN prev_type IS NOT NULL
      |    AND us - prev_us <= 3600000000 THEN prev_type
      |    ELSE 'direct' END AS channel
      |  FROM ev WHERE event_type = 'purchase'),
      |cells AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases
      |          FROM p GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS total FROM cells)
      |SELECT channel, n_purchases,
      |  n_purchases * 1000000 // total AS share_ppm
      |FROM cells, tot ORDER BY channel""".stripMargin

  // B69 (r9): per-group linear trend + next-period forecast — the
  // "is revenue trending up, and what do we expect tomorrow" report
  // every metrics warehouse serves (the closed-form least-squares
  // fit, not an iterative model). Two hash aggs: (priority, day) →
  // daily cents, then per-priority regression moments (n, Σx, Σy,
  // Σxy, Σxx) — the same exact-integer-moment discipline as B50.
  // Days are SHIFTED to x' = day − min(day) before the moment agg
  // (one global 1-row min, broadcast — the declared stats join):
  // unshifted epoch-day moments overflow BIGINT at n·Σxy ≈ 2e19 for
  // two years of sf0.1 revenue; shifted they bound at ~8e17. Slope
  // is exported in milli-cents/day via the two-step quotient+
  // remainder idiom (B64's chi2_milli pattern) because a direct
  // ×1000 pre-divide can overflow; the forecast composes mean +
  // slope·(x_next − x̄) with declared truncation points mirrored
  // verbatim in the oracle. Scale shape: moment aggs are map-side
  // combinable; the report is |groups| rows.
  def qTrendForecast(s: SparkSession, d: String): DataFrame =
    trendForecast(T.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"),
        col("o_totalprice"))
      .groupBy("prio", "day")
      .agg(expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").as("y_c")))

  /** B69 core over a (prio, day, y_c) relation — separated so laws
    * can plant exact lines/steps. See [[qTrendForecast]].
    */
  def trendForecast(daily: DataFrame): DataFrame = {
    val minDay = daily.agg(min("day").as("day0"))
    val xy = daily.crossJoin(broadcast(minDay))
      .select(col("prio"), (col("day") - col("day0")).as("x"), col("y_c"))
    // Centered moments (r11 — the sf1.0 full-board probe overflowed
    // the raw form: n·Σxy ≈ 2.2×10¹⁹ > 2⁶³ at ×10 revenue): the slope
    // moments are SHIFT-INVARIANT in exact integers — for any integer
    // c, d:  n·Σ(x−c)(y−d) − Σ(x−c)·Σ(y−d) = n·Σxy − Σx·Σy — so both
    // axes center on their integer means and every term drops by the
    // mean's magnitude squared (n·Σx'y' ≈ 1.4×10¹⁷ here, ~×50 Long
    // headroom; truly unbounded scale would need DECIMAL(38)
    // internals, documented trade). Costs one extra group-sized agg +
    // a broadcast join back — the groups relation is |prios| rows.
    val sums = xy.groupBy("prio")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y_c").as("sy"),
        max("x").as("xmax"))
      .select(col("prio"), col("n"), col("sx"), col("sy"), col("xmax"),
        expr("sx DIV n").as("cx"), expr("sy DIV n").as("cy"))
    val mom = xy.join(broadcast(sums.select("prio", "cx", "cy")), Seq("prio"))
      .groupBy("prio")
      .agg(expr("CAST(sum((x - cx) * (y_c - cy)) AS BIGINT)").as("sxyc"),
        expr("CAST(sum((x - cx) * (x - cx)) AS BIGINT)").as("sxxc"))
    sums.join(mom, Seq("prio"))
      .select(col("prio"), col("n"),
        expr("n * sxyc - (sx - n * cx) * (sy - n * cy)").as("num"),
        expr("n * sxxc - (sx - n * cx) * (sx - n * cx)").as("den"),
        col("sy"), col("sx"), col("xmax"))
      .select(col("prio"), col("n"),
        expr("(num DIV den) * 1000 + ((num % den) * 1000) DIV den")
          .as("slope_mc_per_day"),
        expr("sy DIV n").as("mean_day_c"),
        col("sx"), col("xmax"))
      .select(col("prio"), col("n"), col("slope_mc_per_day"),
        col("mean_day_c"),
        expr("""mean_day_c + (slope_mc_per_day * (n * (xmax + 1) - sx))
                DIV (1000 * n)""").as("forecast_next_c"))
      .orderBy("prio")
  }

  private val oTrendForecast =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |    epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y_c
      |  FROM orders GROUP BY 1, 2),
      |d0 AS (SELECT min(day) AS day0 FROM daily),
      |mom AS (
      |  SELECT prio, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(day - day0) AS BIGINT) AS sx,
      |    CAST(sum(y_c) AS BIGINT) AS sy,
      |    CAST(sum((day - day0) * y_c) AS BIGINT) AS sxy,
      |    CAST(sum((day - day0) * (day - day0)) AS BIGINT) AS sxx,
      |    CAST(max(day - day0) AS BIGINT) AS xmax
      |  FROM daily, d0 GROUP BY 1),
      |sl AS (
      |  SELECT prio, n, (n * sxy - sx * sy) AS num,
      |    (n * sxx - sx * sx) AS den, sy, sx, xmax FROM mom),
      |st AS (
      |  SELECT prio, n,
      |    (num // den) * 1000 + ((num % den) * 1000) // den
      |      AS slope_mc_per_day,
      |    sy // n AS mean_day_c, sx, xmax FROM sl)
      |SELECT prio, n, slope_mc_per_day, mean_day_c,
      |  mean_day_c + (slope_mc_per_day * (n * (xmax + 1) - sx))
      |    // (1000 * n) AS forecast_next_c
      |FROM st ORDER BY prio""".stripMargin

  // B70 (r9): Benford first-digit audit — the classic
  // fraud/data-quality screen (does a value column's leading-digit
  // distribution follow log10(1+1/d)?). ONE pruned scan → cents →
  // leading digit via bigint→string cast (identical formatting both
  // engines for positive integers) → 9-row hash agg; observed shares
  // as truncating ppm against the BIGINT Benford constants
  // floor(1e6·log10(1+1/d)) pinned as literals on BOTH sides (no
  // runtime float log anywhere), per-digit squared-deviation
  // contribution in the integer chi-square shape of B64. Scale
  // shape: map-side combinable agg to 9 rows; the 1-row total joins
  // back by broadcast.
  def qBenfordDigits(s: SparkSession, d: String): DataFrame =
    benfordAudit(T.orders(s, d).select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")))

  /** B70 core over a positive (cents) relation — separated so laws
    * can plant exact digit distributions. See [[qBenfordDigits]].
    */
  def benfordAudit(cents: DataFrame): DataFrame = {
    val exp = "CASE digit WHEN 1 THEN 301029L WHEN 2 THEN 176091L " +
      "WHEN 3 THEN 124938L WHEN 4 THEN 96910L WHEN 5 THEN 79181L " +
      "WHEN 6 THEN 66946L WHEN 7 THEN 57991L WHEN 8 THEN 51152L " +
      "ELSE 45757L END"
    val digits = cents
      .select(expr(
        "CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000L DIV total").as("obs_ppm"),
        expr(exp).as("exp_ppm"))
      .withColumn("dev_contrib", expr(
        "((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) DIV exp_ppm"))
      .orderBy("digit")
  }

  private val oBenfordDigits =
    """WITH dg AS (
      |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM dg),
      |obs AS (
      |  SELECT digit, n, n * 1000000 // total AS obs_ppm,
      |    CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
      |      WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
      |      WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
      |      ELSE 45757 END AS exp_ppm
      |  FROM dg, tot)
      |SELECT digit, n, obs_ppm, exp_ppm,
      |  ((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) // exp_ppm
      |    AS dev_contrib
      |FROM obs ORDER BY digit""".stripMargin

  // B71 (r9): CUSUM change-point detection — "when did the level of
  // this metric shift", the ops/metrics staple. Classic CUSUM needs
  // S_t = Σ(y_i − ȳ), a float mean; the re-expression scales by n
  // (dev_i = y_i·n − total) so every partial sum is EXACT integer —
  // argmax|S| is invariant under the positive scaling. Shapes: one
  // map-side-combinable (day) agg, a declared 1-row stats crossJoin
  // for (n, total), then the cumulative window over the |days|-row
  // POST-AGGREGATION report (B65's declared global-window state —
  // never per-order), and a second 1-row crossJoin for the peak
  // verdict. Overflow bound: |dev| ≤ total ≈ 3e12 cents at sf0.1,
  // × 730 days ≈ 2e15 ≪ 2⁶³.
  def qChangepoint(s: SparkSession, d: String): DataFrame =
    cusumChangepoint(T.orders(s, d)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
        col("o_totalprice"))
      .groupBy("day")
      .agg(expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").as("y_c")))
      .orderBy("day")

  /** B71 core over a (day, y_c) relation — separated so laws can
    * plant exact level shifts. See [[qChangepoint]].
    */
  def cusumChangepoint(daily: DataFrame): DataFrame = {
    val tot = daily.agg(count(lit(1)).as("n"), sum("y_c").as("total"))
    val s = daily.crossJoin(broadcast(tot))
      .select(col("day"), col("y_c"), expr("y_c * n - total").as("dev"))
      .withColumn("s_scaled", sum("dev").over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val peak = s.agg(max(abs(col("s_scaled"))).as("peak"))
    s.crossJoin(broadcast(peak))
      .select(col("day"), col("y_c"), col("s_scaled"),
        (abs(col("s_scaled")) === col("peak")).cast("long").as("is_peak"))
  }

  private val oChangepoint =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y_c
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(y_c) AS BIGINT) AS total FROM daily),
      |s AS (SELECT day, y_c,
      |  CAST(sum(y_c * n - total) OVER (ORDER BY day) AS BIGINT)
      |    AS s_scaled
      |  FROM daily, t),
      |p AS (SELECT max(abs(s_scaled)) AS peak FROM s)
      |SELECT day, y_c, s_scaled,
      |  CASE WHEN abs(s_scaled) = peak THEN 1 ELSE 0 END AS is_peak
      |FROM s, p ORDER BY day""".stripMargin

  // B72 (r9): RFM customer segmentation — recency/frequency/monetary
  // quintile scores, the marketing-segmentation staple. The textbook
  // ntile(5)×3 is three single-task global sorts at any scale; the
  // re-expression reuses B67's boundary discipline: ONE
  // percentile_disc aggregate computes all 12 quintile boundaries
  // (4 per metric), broadcast back as a declared 1-row stats
  // crossJoin, scores assigned by codegen'd
  // count-of-boundaries-below (boundary-equal falls LOW —
  // deterministic, and tie-heavy metrics like frequency give every
  // tied customer the SAME score, which ntile cannot). Recency is
  // inverted (most recent = 5). Shapes: per-customer hash agg, two
  // 1-row broadcasts, report ∝ |customers|.
  def qRfm(s: SparkSession, d: String): DataFrame =
    rfmSegments(T.orders(s, d).select(col("o_custkey").as("custkey"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")))
      .orderBy("custkey")

  /** B72 core over a (custkey, day, cents) relation — separated so
    * laws can plant exact quintiles and ties. See [[qRfm]].
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    // r14: 4 boundaries per metric from ONE shared percentile buffer
    // (see graft.functions.Percentiles); results bit-identical.
    def qArr(c: String) = graft.functions.Percentiles
      .percentileDiscArray(col(c), Seq(0.2, 0.4, 0.6, 0.8))
    def score(v: String, bs: String) = expr(
      s"1L + aggregate($bs, 0L, (acc, b) -> acc + CASE WHEN $v > b THEN 1L ELSE 0L END)")
    val base = orders.groupBy("custkey").agg(
      max("day").as("last_day"), count(lit(1)).as("freq"),
      sum("cents").as("mon_c"))
    val maxDay = base.agg(max("last_day").as("day_max"))
    val cust = base.crossJoin(broadcast(maxDay))
      .select(col("custkey"), (col("day_max") - col("last_day")).as("r_days"),
        col("freq"), col("mon_c"))
    val bounds = cust.agg(qArr("r_days").as("rb"), qArr("freq").as("fb"),
      qArr("mon_c").as("mb"))
    cust.crossJoin(broadcast(bounds))
      .select(col("custkey"), col("r_days"), col("freq"), col("mon_c"),
        (lit(6L) - score("r_days", "rb")).as("r_score"),
        score("freq", "fb").as("f_score"),
        score("mon_c", "mb").as("m_score"))
      .withColumn("segment",
        expr("r_score * 100L + f_score * 10L + m_score"))
  }

  // B73 (r9): Pareto concentration audit — "what share of revenue do
  // the top-decile customers hold", the 80/20 staple. The textbook
  // per-segment DESC sort + running share is a per-segment global
  // sort at any scale; the re-expression reuses B67/B72's boundary
  // discipline: the 90th-percentile per-customer-revenue boundary per
  // segment (ONE percentile_disc agg over the per-customer rollup,
  // segment-count rows), broadcast back, then ONE conditional-agg
  // pass (the B28 FILTER shape) splits count/revenue above vs at-or-
  // below it. Boundary-equal falls LOW (excluded from the top set) —
  // deterministic under ties. All sums are exact integer cents
  // bounded by the segment total; share as truncating ppm. Shapes:
  // per-(segment, custkey) hash agg with map-side combine, a
  // |segments|-row broadcast, report ∝ |segments|.
  def qParetoShare(s: SparkSession, d: String): DataFrame = {
    val cust = T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").as("rev_c"))
    val bounds = cust.groupBy("segment").agg(
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY rev_c)").as("b"))
    cust.join(broadcast(bounds), "segment")
      .groupBy("segment")
      .agg(
        count(lit(1)).as("n_cust"),
        count(when(col("rev_c") > col("b"), 1)).as("n_top"),
        sum("rev_c").as("total_c"),
        coalesce(sum(when(col("rev_c") > col("b"), col("rev_c"))), lit(0L))
          .as("top_c"))
      .withColumn("share_ppm", expr("top_c * 1000000L DIV total_c"))
      .orderBy("segment")
  }

  private val oParetoShare =
    """WITH cust AS (
      |  SELECT c_mktsegment AS segment, c_custkey,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |b AS (SELECT segment, quantile_disc(rev_c, 0.9) AS b
      |      FROM cust GROUP BY 1)
      |SELECT cust.segment,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(count(*) FILTER (WHERE rev_c > b) AS BIGINT) AS n_top,
      |  CAST(sum(rev_c) AS BIGINT) AS total_c,
      |  CAST(coalesce(sum(rev_c) FILTER (WHERE rev_c > b), 0) AS BIGINT)
      |    AS top_c,
      |  CAST(coalesce(sum(rev_c) FILTER (WHERE rev_c > b), 0) * 1000000
      |    // sum(rev_c) AS BIGINT) AS share_ppm
      |FROM cust JOIN b ON cust.segment = b.segment
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // B74 (r9): Herfindahl–Hirschman market-concentration index —
  // supplier revenue shares per supplier nation, the antitrust/
  // vendor-risk rollup. Shares as truncating ppm of the nation
  // total; HHI = Σ share² with ONE final floor — exact integer
  // throughout, and Σ share_ppm² ≤ max_share · Σ share_ppm ≤ 10¹²
  // regardless of row count, so the arithmetic never outgrows int64
  // at ANY scale. Shapes: per-supplier hash agg over lineitem
  // (map-side combine, shuffle ∝ |suppliers|), one shuffle join to
  // the supplier dim (supplier ≪ lineitem), a |nations|-row
  // broadcast for totals, report ∝ |nations|.
  def qHhi(s: SparkSession, d: String): DataFrame = {
    val sup = T.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(revExpr)).cast("long").as("rev_c"))
      .join(T.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("nationkey"), col("rev_c"))
    val tot = sup.groupBy("nationkey").agg(sum("rev_c").as("nat_total"))
    sup.join(broadcast(tot), "nationkey")
      .select(col("nationkey"), col("rev_c"),
        expr("rev_c * 1000000L DIV nat_total").as("share_ppm"))
      .groupBy("nationkey")
      .agg(
        count(lit(1)).as("n_suppliers"),
        max("share_ppm").as("top_share_ppm"),
        expr("sum(share_ppm * share_ppm) DIV 1000000L").as("hhi_ppm"))
      .orderBy("nationkey")
  }

  private val oHhi =
    """WITH sup AS (
      |  SELECT s_nationkey AS nationkey,
      |    CAST(sum(round(l_extendedprice * (1.0 - l_discount) * 100.0))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY l_suppkey, s_nationkey),
      |t AS (SELECT nationkey, CAST(sum(rev_c) AS BIGINT) AS nat_total
      |      FROM sup GROUP BY 1),
      |sh AS (
      |  SELECT sup.nationkey, rev_c * 1000000 // nat_total AS share_ppm
      |  FROM sup JOIN t ON sup.nationkey = t.nationkey)
      |SELECT CAST(nationkey AS BIGINT) AS nationkey,
      |  CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm,
      |  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
      |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin

  // B75 (r9): weighted median — the quantity-weighted median unit
  // price per return flag (each price counted with its shipped
  // quantity, the inventory-valuation form a plain median gets
  // wrong). Exact and sort-bounded: collapse to DISTINCT (flag,
  // price-cents) with summed weights first (hash agg, map-side
  // combine — the window then runs over ∝ |distinct prices| rows,
  // never ∝ |lineitem|), cumulative weight per flag ordered by
  // price, lower weighted median = smallest price whose doubled
  // cumulative weight reaches the total. All integer (quantities are
  // integral); deterministic under ties by construction (ordering is
  // by the grouped price value itself).
  def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    // r15: the 3-row-group scan pinned the (flag, price) partial
    // aggregation to 3 tasks (measured 0.87 s of the query) — spread
    // by input size first (see Spread.byBytes).
    val g = graft.ops.Spread.byBytes(
        T.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"),
          col("l_quantity")), 512L << 10)
      .groupBy(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
      .agg(expr("CAST(sum(round(l_quantity)) AS BIGINT)").as("w"))
    // r14 (guide §2.4 — share one exchange): the per-flag total is the
    // same window partition's unbounded sum, so both the cumulative
    // and the total come from ONE WindowExec over one shuffle+sort —
    // was a second lineitem scan+agg plus a broadcast join. Identical
    // integers (sum over the same group), hash-gated.
    val wSpec = Window.partitionBy("l_returnflag").orderBy("price_c")
    val cum = g
      .withColumn("cw", sum("w").over(
        wSpec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("w_total", sum("w").over(
        wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.groupBy("l_returnflag")
      .agg(
        max("w_total").as("w_total"),
        min(when(col("cw") * 2 >= col("w_total"), col("price_c")))
          .as("wmedian_c"))
      .orderBy("l_returnflag")
  }

  private val oWeightedMedian =
    """WITH g AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    CAST(sum(round(l_quantity)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, price_c, w,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_c)
      |      AS BIGINT) AS cw
      |  FROM g),
      |t AS (SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS w_total
      |      FROM g GROUP BY 1)
      |SELECT c.l_returnflag,
      |  max(w_total) AS w_total,
      |  min(CASE WHEN cw * 2 >= w_total THEN price_c END) AS wmedian_c
      |FROM c JOIN t ON c.l_returnflag = t.l_returnflag
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // B76 (r9): new-vs-returning decomposition — per order month, the
  // order count and revenue split between customers in their FIRST
  // month and returning ones (the growth-accounting view every
  // subscription/commerce dashboard leads with). First month per
  // customer is a hash agg on the same key the split join uses, so
  // the shuffle is co-keyed (custkey) and the month rollup is a
  // second map-side-combinable agg; every order in a customer's
  // first month counts as new (deterministic, multi-order firsts
  // included). Exact integer cents + yyyymm keys.
  def qNewVsReturning(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d).select(col("o_custkey"),
      expr("year(o_orderdate) * 100 + month(o_orderdate)").cast("long")
        .as("ym"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val first = o.groupBy("o_custkey").agg(min("ym").as("first_ym"))
    o.join(first, "o_custkey")
      .withColumn("is_new", (col("ym") === col("first_ym")).cast("boolean"))
      .groupBy("ym")
      .agg(
        count(when(col("is_new"), 1)).as("n_new"),
        count(when(!col("is_new"), 1)).as("n_ret"),
        coalesce(sum(when(col("is_new"), col("cents"))), lit(0L))
          .as("rev_new_c"),
        coalesce(sum(when(!col("is_new"), col("cents"))), lit(0L))
          .as("rev_ret_c"))
      .orderBy("ym")
  }

  private val oNewVsReturning =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
      |      AS ym,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey, min(ym) AS first_ym FROM o GROUP BY 1)
      |SELECT ym,
      |  CAST(count(*) FILTER (WHERE ym = first_ym) AS BIGINT) AS n_new,
      |  CAST(count(*) FILTER (WHERE ym <> first_ym) AS BIGINT) AS n_ret,
      |  CAST(coalesce(sum(cents) FILTER (WHERE ym = first_ym), 0)
      |    AS BIGINT) AS rev_new_c,
      |  CAST(coalesce(sum(cents) FILTER (WHERE ym <> first_ym), 0)
      |    AS BIGINT) AS rev_ret_c
      |FROM o JOIN f USING (o_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // B77 (r9): ABC classification — rank suppliers within each nation
  // by revenue, classify by cumulative share (A ≤ 70%, B ≤ 90%, C
  // rest), the inventory/vendor-tiering staple. The cumulative order
  // is inherent to the metric, so the window runs PARTITIONED BY
  // NATION over the per-supplier POST-AGGREGATION report (state ∝
  // suppliers per nation, parallel across nations — never a global
  // single-task sort, and never ∝ lineitem). Deterministic under
  // ties (rev DESC, suppkey); cumulative share as truncating ppm of
  // the nation total via a |nations|-row broadcast.
  def qAbcClass(s: SparkSession, d: String): DataFrame = {
    val sup = T.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(revExpr)).cast("long").as("rev_c"))
      .join(T.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("nationkey"),
        col("l_suppkey").as("suppkey"), col("rev_c"))
    val tot = sup.groupBy("nationkey").agg(sum("rev_c").as("nat_total"))
    sup.join(broadcast(tot), "nationkey")
      .withColumn("cum_c", sum("rev_c").over(
        Window.partitionBy("nationkey")
          .orderBy(col("rev_c").desc, col("suppkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("nationkey"), col("suppkey"), col("rev_c"),
        expr("cum_c * 1000000L DIV nat_total").as("cum_ppm"))
      .withColumn("abc_class",
        when(col("cum_ppm") <= 700000L, "A")
          .when(col("cum_ppm") <= 900000L, "B").otherwise("C"))
      .orderBy("nationkey", "suppkey")
  }

  private val oAbcClass =
    """WITH sup AS (
      |  SELECT s_nationkey AS nationkey, l_suppkey AS suppkey,
      |    CAST(sum(round(l_extendedprice * (1.0 - l_discount) * 100.0))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |t AS (SELECT nationkey, CAST(sum(rev_c) AS BIGINT) AS nat_total
      |      FROM sup GROUP BY 1),
      |c AS (
      |  SELECT sup.nationkey, suppkey, rev_c,
      |    CAST(sum(rev_c) OVER (PARTITION BY sup.nationkey
      |      ORDER BY rev_c DESC, suppkey) * 1000000 // nat_total
      |      AS BIGINT) AS cum_ppm
      |  FROM sup JOIN t ON sup.nationkey = t.nationkey)
      |SELECT CAST(nationkey AS BIGINT) AS nationkey, suppkey, rev_c,
      |  cum_ppm,
      |  CASE WHEN cum_ppm <= 700000 THEN 'A'
      |       WHEN cum_ppm <= 900000 THEN 'B' ELSE 'C' END AS abc_class
      |FROM c ORDER BY nationkey, suppkey""".stripMargin

  // B78 (r9): cohort LTV curve — cumulative revenue per (first-order
  // cohort month, months-of-age), normalized per cohort member: the
  // lifetime-value view B61's retention matrix counts heads for.
  // Cohort assignment is a hash agg on the SAME key as the split
  // join (co-keyed custkey shuffle, B76's shape); the (cohort, age)
  // rollup is map-side-combinable; the cumulative window runs over
  // the |cohorts × ages| POST-AGGREGATION report partitioned by
  // cohort. Integer month arithmetic (y·12+m), exact cents, per-head
  // LTV as floor division by the cohort's member count.
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d).select(col("o_custkey"),
      expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").cast("long")
        .as("mix"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val first = o.groupBy("o_custkey").agg(min("mix").as("cohort_mix"))
    val sizes = first.groupBy("cohort_mix")
      .agg(count(lit(1)).as("cohort_size"))
    o.join(first, "o_custkey")
      .groupBy(col("cohort_mix"), (col("mix") - col("cohort_mix")).as("age"))
      .agg(sum("cents").as("rev_c"))
      .withColumn("cum_rev_c", sum("rev_c").over(
        Window.partitionBy("cohort_mix").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(sizes), "cohort_mix")
      .select(
        expr("cohort_mix DIV 12 * 100 + cohort_mix % 12 + 1").as("cohort_ym"),
        col("age"), col("rev_c"), col("cum_rev_c"), col("cohort_size"),
        expr("cum_rev_c DIV cohort_size").as("ltv_per_head_c"))
      .orderBy("cohort_ym", "age")
  }

  private val oCohortLtv =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS mix,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey, min(mix) AS cohort_mix FROM o GROUP BY 1),
      |sz AS (SELECT cohort_mix, CAST(count(*) AS BIGINT) AS cohort_size
      |       FROM f GROUP BY 1),
      |r AS (
      |  SELECT cohort_mix, mix - cohort_mix AS age,
      |    CAST(sum(cents) AS BIGINT) AS rev_c
      |  FROM o JOIN f USING (o_custkey) GROUP BY 1, 2),
      |c AS (
      |  SELECT cohort_mix, age, rev_c,
      |    CAST(sum(rev_c) OVER (PARTITION BY cohort_mix ORDER BY age)
      |      AS BIGINT) AS cum_rev_c
      |  FROM r)
      |SELECT cohort_mix // 12 * 100 + cohort_mix % 12 + 1 AS cohort_ym,
      |  age, rev_c, cum_rev_c, cohort_size,
      |  cum_rev_c // cohort_size AS ltv_per_head_c
      |FROM c JOIN sz USING (cohort_mix)
      |ORDER BY cohort_ym, age""".stripMargin

  // B79 (r9): seasonal index — each calendar month's revenue share
  // against a flat year (ppm of 1e6 = no seasonality), the
  // demand-planning staple under B69's trend line. ONE pruned scan →
  // 12-row map-side-combinable hash agg → declared 1-row total
  // crossJoin; index = month_rev · 12 · 10⁶ / total with one
  // truncating division — exact integer throughout.
  def qSeasonalIndex(s: SparkSession, d: String): DataFrame = {
    val m = T.orders(s, d)
      .groupBy(month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").as("rev_c"))
    val tot = m.agg(sum("rev_c").as("total_c"))
    // Two-step exact ppm (r11 — the sf1.0 full-board probe overflowed
    // the single product: rev_c·12·10⁶ ≈ 4×10¹⁹ > 2⁶³): split the 10⁶
    // scale into 10³·10³ around the division — exact for non-negative
    // operands ((a·1000) div T ·1000 + ((a·1000 mod T)·1000) div T =
    // (a·10⁶) div T), every intermediate ≤ max(rev_c·12000, total·1000)
    // — Long-safe to ~×200 the sf1.0 corpus.
    m.crossJoin(broadcast(tot))
      .select(col("m"), col("n_orders"), col("rev_c"),
        expr("""((rev_c * 12L * 1000L) DIV total_c) * 1000L +
                ((rev_c * 12L * 1000L) % total_c) * 1000L DIV total_c""")
          .as("index_ppm"))
      .orderBy("m")
  }

  private val oSeasonalIndex =
    """WITH m AS (
      |  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c FROM m)
      |SELECT m, n_orders, rev_c,
      |  CAST(((rev_c * 12 * 1000) // total_c) * 1000 +
      |       ((rev_c * 12 * 1000) % total_c) * 1000 // total_c AS BIGINT)
      |    AS index_ppm
      |FROM m, t ORDER BY m""".stripMargin

  // B80 (r9): fulfillment-latency percentiles — order-to-ship day
  // gaps per order priority (the SLA view): one co-keyed orderkey
  // join (lineitem ⨝ orders — both sides shuffle on the same key,
  // no broadcast needed at any scale), integer day arithmetic, then
  // the B67 boundary discipline computes p50/p90/p99 + mean in ONE
  // hash agg per priority — no per-priority sort materializes rows.
  def qFulfillmentLatency(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d)
      .select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
          .as("ship_day"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("order_day")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        (col("ship_day") - col("order_day")).as("gap_days"))
      .groupBy("prio")
      .agg(count(lit(1)).as("n_lines"),
        // r14: p50/p90/p99 from ONE shared percentile buffer (see
        // graft.functions.Percentiles); results bit-identical.
        graft.functions.Percentiles
          .percentileDiscArray(col("gap_days"), Seq(0.5, 0.9, 0.99)).as("ps"),
        expr("sum(gap_days) DIV count(*)").as("mean_days"))
      .select(col("prio"), col("n_lines"),
        expr("CAST(ps[0] AS BIGINT)").as("p50"),
        expr("CAST(ps[1] AS BIGINT)").as("p90"),
        expr("CAST(ps[2] AS BIGINT)").as("p99"),
        col("mean_days"))
      .orderBy("prio")
  }

  private val oFulfillmentLatency =
    """WITH g AS (
      |  SELECT o_orderpriority AS prio,
      |    epoch_us(l_shipdate) // 86400000000
      |      - epoch_us(o_orderdate) // 86400000000 AS gap_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT prio, CAST(count(*) AS BIGINT) AS n_lines,
      |  quantile_disc(gap_days, 0.5) AS p50,
      |  quantile_disc(gap_days, 0.9) AS p90,
      |  quantile_disc(gap_days, 0.99) AS p99,
      |  CAST(sum(gap_days) // count(*) AS BIGINT) AS mean_days
      |FROM g GROUP BY prio ORDER BY prio""".stripMargin

  // B81 (r9): leaderboard rank movers — each customer's within-month
  // revenue rank and its change vs their previous ACTIVE month (the
  // "fastest risers" dynamics B65's metric deltas can't see: rank is
  // relative, so a customer can grow revenue and still fall). Two
  // window passes over the per-(customer, month) POST-AGGREGATION
  // report: rank partitioned BY MONTH (parallel across months,
  // deterministic tie order rev DESC then custkey), lag partitioned
  // BY CUSTOMER ordered by month. Export filtered to moves of ≥ 50
  // places (a deterministic integer screen keeping the report
  // mover-sized).
  def qRankMovers(s: SparkSession, d: String): DataFrame = {
    val cm = T.orders(s, d)
      .groupBy(col("o_custkey"),
        expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
          .as("ym"))
      .agg(expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").as("rev_c"))
    val ranked = cm.withColumn("rnk", row_number().over(
      Window.partitionBy("ym").orderBy(col("rev_c").desc, col("o_custkey")))
      .cast("long"))
    ranked
      .withColumn("prev_rnk", lag("rnk", 1).over(
        Window.partitionBy("o_custkey").orderBy("ym")))
      .filter(col("prev_rnk").isNotNull)
      .withColumn("delta", col("prev_rnk") - col("rnk"))
      .filter(abs(col("delta")) >= 50L)
      .select(col("o_custkey"), col("ym"), col("rev_c"), col("rnk"),
        col("prev_rnk"), col("delta"))
      .orderBy("o_custkey", "ym")
  }

  private val oRankMovers =
    """WITH cm AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
      |      AS ym,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT o_custkey, ym, rev_c,
      |    CAST(row_number() OVER (PARTITION BY ym
      |      ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS rnk
      |  FROM cm),
      |l AS (
      |  SELECT o_custkey, ym, rev_c, rnk,
      |    lag(rnk) OVER (PARTITION BY o_custkey ORDER BY ym) AS prev_rnk
      |  FROM r)
      |SELECT o_custkey, ym, rev_c, rnk, prev_rnk, prev_rnk - rnk AS delta
      |FROM l WHERE prev_rnk IS NOT NULL AND abs(prev_rnk - rnk) >= 50
      |ORDER BY o_custkey, ym""".stripMargin

  // B82 (r9): top-k WITH TIES — every supplier whose within-nation
  // revenue DENSE rank ≤ 3 (ANSI FETCH FIRST k ROWS WITH TIES per
  // group): B19's bounded hash agg deliberately breaks ties; this is
  // the complementary contract where equal revenues must ALL
  // surface. dense_rank runs over the per-supplier POST-AGGREGATION
  // report partitioned by nation (parallel across nations, state ∝
  // suppliers per nation, never ∝ lineitem); revenue in exact cents
  // so tie groups are well-defined.
  def qTopkWithTies(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(revExpr)).cast("long").as("rev_c"))
      .join(T.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("nationkey"),
        col("l_suppkey").as("suppkey"), col("rev_c"))
      .withColumn("rnk", dense_rank().over(
        Window.partitionBy("nationkey").orderBy(col("rev_c").desc))
        .cast("long"))
      .filter(col("rnk") <= 3L)
      .orderBy("nationkey", "rnk", "suppkey")

  private val oTopkWithTies =
    """WITH sup AS (
      |  SELECT s_nationkey AS nationkey, l_suppkey AS suppkey,
      |    CAST(sum(round(l_extendedprice * (1.0 - l_discount) * 100.0))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2)
      |SELECT CAST(nationkey AS BIGINT) AS nationkey, suppkey, rev_c,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM (SELECT nationkey, suppkey, rev_c,
      |        dense_rank() OVER (PARTITION BY nationkey
      |          ORDER BY rev_c DESC) AS rnk
      |      FROM sup) t
      |WHERE rnk <= 3 ORDER BY nationkey, rnk, suppkey""".stripMargin

  // B83 (r9): multi-touch LINEAR attribution — every purchase splits
  // exactly 10⁶ ppm of credit equally across its distinct preceding
  // touches inside the lookback (B68's last-touch gives the final
  // click everything; linear is the other bookend every marketing
  // stack reports). Exactness: base = 10⁶ DIV n per touch, the
  // division REMAINDER goes to the LAST touch (deterministic by
  // (us, event_id)), so per-purchase credit sums to exactly 10⁶ and
  // the channel totals are exact integers. Shapes: one co-keyed
  // purchase×touch self-join per user (both sides shuffle on
  // user_id; pairs ∝ touches within lookback, never events²), one
  // per-purchase hash agg for (n, last), one channel rollup;
  // touchless purchases credit 'direct' in full via anti-join.
  def qAttributionLinear(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val lookbackUs = 3600000000L
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("us").as("pus"))
    val t = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("tid"), col("us").as("tus"),
        col("event_type").as("channel"))
    val pairs = p.join(t, Seq("user_id"))
      .filter((col("tus") < col("pus") ||
        (col("tus") === col("pus") && col("tid") < col("pid"))) &&
        col("pus") - col("tus") <= lookbackUs)
    val perP = pairs.groupBy("pid")
      .agg(count(lit(1)).as("n_touches"),
        expr("max_by(tid, struct(tus, tid))").as("last_tid"))
    val creditRows = pairs.join(perP, "pid")
      .select(col("channel"),
        (expr("1000000L DIV n_touches") +
          when(col("tid") === col("last_tid"),
            expr("1000000L - (1000000L DIV n_touches) * n_touches"))
            .otherwise(0L)).as("credit_ppm"))
    val direct = p.join(pairs.select("pid").distinct(), Seq("pid"), "left_anti")
      .select(lit("direct").as("channel"), lit(1000000L).as("credit_ppm"))
    creditRows.unionByName(direct)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_credits"), sum("credit_ppm").as("credit_ppm_sum"))
      .orderBy("channel")
  }

  private val oAttributionLinear =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events),
      |p AS (SELECT user_id, event_id AS pid, us AS pus FROM ev
      |      WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_id AS tid, us AS tus,
      |        event_type AS channel FROM ev
      |      WHERE event_type <> 'purchase'),
      |pairs AS (
      |  SELECT p.user_id, pid, pus, tid, tus, channel
      |  FROM p JOIN t ON p.user_id = t.user_id
      |  WHERE (tus < pus OR (tus = pus AND tid < pid))
      |    AND pus - tus <= 3600000000),
      |perp AS (
      |  SELECT pid, CAST(count(*) AS BIGINT) AS n_touches,
      |    arg_max(tid, lpad(CAST(tus AS VARCHAR), 20, '0')
      |      || lpad(CAST(tid AS VARCHAR), 20, '0')) AS last_tid
      |  FROM pairs GROUP BY 1),
      |credits AS (
      |  SELECT channel,
      |    1000000 // n_touches +
      |      CASE WHEN tid = last_tid
      |        THEN 1000000 - (1000000 // n_touches) * n_touches
      |        ELSE 0 END AS credit_ppm
      |  FROM pairs JOIN perp USING (pid)
      |  UNION ALL
      |  SELECT 'direct', 1000000 FROM p
      |  WHERE pid NOT IN (SELECT pid FROM pairs))
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
      |  CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_sum
      |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin

  // B84 (r9): box-plot statistics — per return flag over unit-price
  // cents: quartiles, IQR, the 1.5·IQR Tukey whisker bounds, and
  // outlier counts beyond each whisker. TWO passes in the B67
  // boundary discipline: one percentile_disc agg computes q1/median/
  // q3 per flag (|flags| rows, broadcast back), one conditional-agg
  // pass (B28 FILTER shape) counts whisker violations — no
  // per-group sort ever materializes rows. All integer: whisker =
  // q1 − (3·iqr) DIV 2 (both engines truncate toward zero).
  def qBoxplot(s: SparkSession, d: String): DataFrame = {
    val rows = T.lineitem(s, d).select(col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
    // r14: q1/med/q3 from ONE shared percentile buffer per group (see
    // graft.functions.Percentiles) — was 3 independent value-map
    // buffers over every lineitem row; results bit-identical.
    val q = rows.groupBy("l_returnflag")
      .agg(graft.functions.Percentiles
        .percentileDiscArray(col("price_c"), Seq(0.25, 0.5, 0.75)).as("qs"))
      .select(col("l_returnflag"),
        expr("CAST(qs[0] AS BIGINT)").as("q1"),
        expr("CAST(qs[1] AS BIGINT)").as("med"),
        expr("CAST(qs[2] AS BIGINT)").as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("whisker_lo", expr("q1 - (3L * iqr) DIV 2"))
      .withColumn("whisker_hi", expr("q3 + (3L * iqr) DIV 2"))
    rows.join(broadcast(q), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        max("q1").as("q1"), max("med").as("med"), max("q3").as("q3"),
        max("iqr").as("iqr"),
        max("whisker_lo").as("whisker_lo"), max("whisker_hi").as("whisker_hi"),
        count(when(col("price_c") < col("whisker_lo"), 1)).as("n_outliers_lo"),
        count(when(col("price_c") > col("whisker_hi"), 1)).as("n_outliers_hi"))
      .orderBy("l_returnflag")
  }

  private val oBoxplot =
    """WITH r AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem),
      |q AS (
      |  SELECT l_returnflag,
      |    quantile_disc(price_c, 0.25) AS q1,
      |    quantile_disc(price_c, 0.5) AS med,
      |    quantile_disc(price_c, 0.75) AS q3
      |  FROM r GROUP BY 1),
      |b AS (
      |  SELECT l_returnflag, q1, med, q3, q3 - q1 AS iqr,
      |    q1 - (3 * (q3 - q1)) // 2 AS whisker_lo,
      |    q3 + (3 * (q3 - q1)) // 2 AS whisker_hi
      |  FROM q)
      |SELECT r.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  max(q1) AS q1, max(med) AS med, max(q3) AS q3, max(iqr) AS iqr,
      |  max(whisker_lo) AS whisker_lo, max(whisker_hi) AS whisker_hi,
      |  CAST(count(*) FILTER (WHERE price_c < whisker_lo) AS BIGINT)
      |    AS n_outliers_lo,
      |  CAST(count(*) FILTER (WHERE price_c > whisker_hi) AS BIGINT)
      |    AS n_outliers_hi
      |FROM r JOIN b ON r.l_returnflag = b.l_returnflag
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val oRfm =
    """WITH base AS (
      |  SELECT o_custkey AS custkey,
      |    max(epoch_us(o_orderdate) // 86400000000) AS last_day,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS mon_c
      |  FROM orders GROUP BY 1),
      |md AS (SELECT max(last_day) AS day_max FROM base),
      |cust AS (
      |  SELECT custkey, day_max - last_day AS r_days, freq, mon_c
      |  FROM base, md),
      |b AS (SELECT
      |  quantile_disc(r_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
      |  quantile_disc(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
      |  quantile_disc(mon_c, [0.2, 0.4, 0.6, 0.8]) AS mb FROM cust),
      |sc AS (
      |  SELECT custkey, r_days, freq, mon_c,
      |    6 - (1 + len(list_filter(rb, x -> r_days > x))) AS r_score,
      |    1 + len(list_filter(fb, x -> freq > x)) AS f_score,
      |    1 + len(list_filter(mb, x -> mon_c > x)) AS m_score
      |  FROM cust, b)
      |SELECT custkey, r_days, freq, mon_c,
      |  CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment
      |FROM sc ORDER BY custkey""".stripMargin

  // B85 (r9): survival analysis — the Kaplan–Meier risk table for
  // repeat purchase. Subject = customer, event = the SECOND order,
  // duration = days from first to second order; one-order customers
  // are right-CENSORED at the corpus horizon (max order date). Output
  // is the per-30-day-bucket risk table: n_at_risk (cumulative
  // survivors entering the bucket), n_events, n_censored, and the
  // conditional survival of the bucket in integer ppm — the exact
  // inputs a K-M curve multiplies (the cumulative product itself is
  // float-order-sensitive, so the gate pins the risk table, not the
  // curve). Shape: two per-customer MIN aggs (customers ≪ orders)
  // chained by one broadcast join, a 1-row horizon agg, then every
  // window runs over the ~80-row bucket table — nothing per-order
  // ever sorts.
  def qSurvival(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d).select(col("o_custkey").as("custkey"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
    val first = o.groupBy("custkey").agg(min("day").as("d1"))
    val second = o.join(broadcast(first), "custkey")
      .filter(col("day") > col("d1"))
      .groupBy("custkey").agg(min("day").as("d2"))
    val horizon = o.agg(max("day").as("h"))
    val durations = first.join(second, Seq("custkey"), "left").crossJoin(broadcast(horizon))
      .select(
        when(col("d2").isNotNull, lit(1L)).otherwise(lit(0L)).as("is_event"),
        (coalesce(col("d2"), col("h")) - col("d1")).as("dur_days"))
      .select(col("is_event"), expr("dur_days DIV 30").as("bucket"))
    val cells = durations.groupBy("bucket")
      .agg(sum("is_event").as("n_events"),
        sum(lit(1L) - col("is_event")).as("n_censored"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    cells
      .withColumn("n_at_risk",
        expr("sum(n_events + n_censored) OVER ()")
          - coalesce(sum(col("n_events") + col("n_censored")).over(w), lit(0L)))
      .select(col("bucket"), col("n_at_risk"), col("n_events"), col("n_censored"),
        expr("(n_at_risk - n_events) * 1000000 DIV n_at_risk").as("cond_surv_ppm"))
      .orderBy("bucket")
  }

  private val oSurvival =
    """WITH o AS (SELECT o_custkey AS custkey,
      |    epoch_us(o_orderdate) // 86400000000 AS day FROM orders),
      |f AS (SELECT custkey, min(day) AS d1 FROM o GROUP BY 1),
      |s2 AS (SELECT o.custkey, min(o.day) AS d2
      |       FROM o JOIN f ON o.custkey = f.custkey
      |       WHERE o.day > f.d1 GROUP BY 1),
      |h AS (SELECT max(day) AS h FROM o),
      |dur AS (
      |  SELECT CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS is_event,
      |    (coalesce(d2, h.h) - d1) // 30 AS bucket
      |  FROM f LEFT JOIN s2 ON f.custkey = s2.custkey CROSS JOIN h),
      |cells AS (
      |  SELECT bucket, CAST(sum(is_event) AS BIGINT) AS n_events,
      |    CAST(sum(1 - is_event) AS BIGINT) AS n_censored
      |  FROM dur GROUP BY 1)
      |SELECT bucket,
      |  CAST(sum(n_events + n_censored) OVER ()
      |    - coalesce(sum(n_events + n_censored) OVER (ORDER BY bucket
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS n_at_risk,
      |  n_events, n_censored,
      |  CAST((sum(n_events + n_censored) OVER ()
      |    - coalesce(sum(n_events + n_censored) OVER (ORDER BY bucket
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - n_events)
      |    * 1000000
      |    // (sum(n_events + n_censored) OVER ()
      |       - coalesce(sum(n_events + n_censored) OVER (ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS BIGINT)
      |    AS cond_surv_ppm
      |FROM cells ORDER BY bucket""".stripMargin

  // B86 (r9): referential-integrity audit — the dbt-`relationships` /
  // FK-constraint validation sweep a warehouse runs over every load:
  // one row per declared child→parent edge with child cardinality,
  // orphan count, and orphan ppm. Each edge is ONE left-anti join;
  // dimension parents broadcast (region/nation/customer/supplier/
  // part), the two fact-side edges shuffle on the key they'd join on
  // anyway. The union is |edges| rows — audit output, not data.
  def qFkAudit(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String, bcast: Boolean): DataFrame = {
      val p0 = parent.select(col(parentKey)).distinct()
      val p = if (bcast) broadcast(p0) else p0
      val orphans = child.select(col(childKey))
        .join(p, col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child")).crossJoin(orphans)
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          expr("coalesce(n_orphans * 1000000 DIV nullif(n_child, 0), 0)").as("orphan_ppm"))
    }
    val li = T.lineitem(s, d); val ord = T.orders(s, d)
    edge("lineitem.orderkey->orders", li, "l_orderkey", ord, "o_orderkey", bcast = false)
      .union(edge("lineitem.partkey->part", li, "l_partkey", T.part(s, d), "p_partkey", bcast = true))
      .union(edge("lineitem.suppkey->supplier", li, "l_suppkey", T.supplier(s, d), "s_suppkey", bcast = true))
      .union(edge("orders.custkey->customer", ord, "o_custkey", T.customer(s, d), "c_custkey", bcast = true))
      .union(edge("customer.nationkey->nation", T.customer(s, d), "c_nationkey", T.nation(s, d), "n_nationkey", bcast = true))
      .union(edge("supplier.nationkey->nation", T.supplier(s, d), "s_nationkey", T.nation(s, d), "n_nationkey", bcast = true))
      .union(edge("nation.regionkey->region", T.nation(s, d), "n_regionkey", T.region(s, d), "r_regionkey", bcast = true))
      .orderBy("relation")
  }

  private val oFkAudit = {
    def e(name: String, child: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS relation,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child
         |   WHERE $ck NOT IN (SELECT $pk FROM $parent)) AS n_orphans""".stripMargin
    val edges = Seq(
      e("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      e("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      e("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      e("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      e("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      e("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      e("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("\nUNION ALL\n")
    s"""WITH edges AS (
       |$edges)
       |SELECT relation, n_child, n_orphans,
       |  CAST(coalesce(n_orphans * 1000000 // nullif(n_child, 0), 0) AS BIGINT)
       |    AS orphan_ppm
       |FROM edges ORDER BY relation""".stripMargin
  }

  // B87 (r9): join-key skew report — the diagnostic a 100 TB shuffle
  // plan is tuned from: per candidate join key, the cardinality, the
  // hottest key's row count and corpus share, and how many times the
  // hottest key exceeds the mean (the direct salting-factor input;
  // AQE's skew-join split threshold is keyed off exactly this shape).
  // Per column: ONE per-key hash agg (map-side combined — the same
  // shuffle a join on that key would pay) collapsed by a 1-row agg;
  // the report is |columns| rows. All integer ppm/×100 arithmetic.
  def qSkewReport(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
    def one(c: String): DataFrame =
      li.groupBy(col(c)).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"),
          max("n").as("max_key_rows"))
        .select(lit(c).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_key_rows"),
          expr("max_key_rows * 1000000 DIV n_rows").as("top1_share_ppm"),
          expr("max_key_rows * n_keys * 100 DIV n_rows").as("max_over_avg_x100"))
    one("l_orderkey").union(one("l_partkey")).union(one("l_suppkey"))
      .orderBy("key_col")
  }

  private val oSkewReport = {
    def one(c: String) =
      s"""SELECT '$c' AS key_col, CAST(sum(n) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(max(n) AS BIGINT) AS max_key_rows,
         |  CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top1_share_ppm,
         |  CAST(max(n) * count(*) * 100 // sum(n) AS BIGINT) AS max_over_avg_x100
         |FROM (SELECT $c, count(*) AS n FROM lineitem GROUP BY 1) t""".stripMargin
    Seq(one("l_orderkey"), one("l_partkey"), one("l_suppkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_skew_report", qSkewReport, Some(oSkewReport)),
    QueryDef("q_changepoint", qChangepoint, Some(oChangepoint)),
    QueryDef("q_rfm", qRfm, Some(oRfm)),
    QueryDef("q_trend_forecast", qTrendForecast, Some(oTrendForecast)),
    QueryDef("q_benford", qBenfordDigits, Some(oBenfordDigits)),
    QueryDef("q_event_pattern", qEventPattern, Some(oEventPattern)),
    QueryDef("q_path_transitions", qPathTransitions, Some(oPathTransitions)),
    QueryDef("q_equidepth_hist", qEquidepthHist, Some(oEquidepthHist)),
    QueryDef("q_attribution", qAttribution, Some(oAttribution)),
    QueryDef("q_anomaly_mad", qAnomalyMad, Some(oAnomalyMad)),
    QueryDef("q_experiment_ab", qExperimentAb, Some(oExperimentAb)),
    QueryDef("q_mann_whitney", qMannWhitney, Some(oMannWhitney)),
    QueryDef("q_window_actives", qWindowActives, Some(oWindowActives)),
    QueryDef("q_period_over_period", qPeriodOverPeriod, Some(oPeriodOverPeriod)),
    QueryDef("q_basket_pairs", qBasketPairs, Some(oBasketPairs)),
    QueryDef("q_funnel", qFunnel, Some(oFunnel)),
    QueryDef("q_retention", qRetention, Some(oRetention)),
    QueryDef("q_filter_project", qFilterProject, Some(oFilterProject)),
    QueryDef("q_try_funcs", qTryFuncs, Some(oTryFuncs)),
    QueryDef("q1_agg", q1Agg, Some(oQ1)),
    QueryDef("q3_topk", q3Topk, Some(oQ3)),
    QueryDef("q5_multijoin", q5Multijoin, Some(oQ5)),
    QueryDef("q_window_rank", qWindowRank, Some(oWindowRank)),
    QueryDef("q_topk_agg", qTopkAgg, Some(oWindowRank)),
    QueryDef("q_window_stats", qWindowStats, Some(oWindowStats)),
    QueryDef("q_semi_anti", qSemiAnti, Some(oSemiAnti)),
    QueryDef("q_distinct", qDistinct, Some(oDistinct)),
    QueryDef("q_rollup", qRollup, Some(oRollup)),
    QueryDef("q_cube", qCube, Some(oCube)),
    QueryDef("q_grouping_sets", qGroupingSets, Some(oGroupingSets)),
    QueryDef("q_event_windows", qEventWindows, Some(oEventWindows)),
    QueryDef("q_sliding_windows", qSlidingWindows, Some(oSlidingWindows)),
    QueryDef("q_json_extract", qJsonExtract, Some(oJsonExtract)),
    QueryDef("q_pivot", qPivot, Some(oPivot)),
    QueryDef("q_setops", qSetops, Some(oSetops)),
    QueryDef("q_setops_all", qSetopsAll, Some(oSetopsAll)),
    QueryDef("q_null_semantics", qNullSemantics, Some(oNullSemantics)),
    QueryDef("q_median", qMedian, Some(oMedian)),
    QueryDef("q_mode_disc", qModeDisc, Some(oModeDisc)),
    QueryDef("q_explode_ordinality", qExplodeOrdinality, Some(oExplodeOrdinality)),
    QueryDef("q_range_window", qRangeWindow, Some(oRangeWindow)),
    QueryDef("q_lag_lead", qLagLead, Some(oLagLead)),
    QueryDef("q_string_agg", qStringAgg, Some(oStringAgg)),
    QueryDef("q_arg_extremes", qArgExtremes, Some(oArgExtremes)),
    QueryDef("q_unpivot", qUnpivot, Some(oUnpivot)),
    QueryDef("q_agg_filter", qAggFilter, Some(oAggFilter)),
    QueryDef("q_scalar_subquery", qScalarSubquery, Some(oScalarSubquery)),
    QueryDef("q_recursive_cte", qRecursiveCte, Some(oRecursiveCte)),
    QueryDef("q_lateral_topn", qLateralTopn, Some(oLateralTopn)),
    QueryDef("q_percentile_cont", qPercentileCont, Some(oPercentileCont)),
    QueryDef("q_histogram", qHistogram, Some(oHistogram)),
    QueryDef("q_string_funcs", qStringFuncs, Some(oStringFuncs)),
    QueryDef("q_datetime_funcs", qDatetimeFuncs, Some(oDatetimeFuncs)),
    QueryDef("q_moving_avg", qMovingAvg, Some(oMovingAvg)),
    QueryDef("q_not_in_nulls", qNotInNulls, Some(oNotInNulls)),
    QueryDef("q_variant", qVariant, Some(oVariant)),
    QueryDef("q_higher_order", qHigherOrder, Some(oHigherOrder)),
    QueryDef("q_regexp_funcs", qRegexpFuncs, Some(oRegexpFuncs)),
    QueryDef("q_union_by_name", qUnionByName, Some(oUnionByName)),
    QueryDef("q_full_outer_recon", qFullOuterRecon, Some(oFullOuterRecon)),
    QueryDef("q_running_distinct", qRunningDistinct, Some(oRunningDistinct)),
    QueryDef("q_sorted_arrays", qSortedArrays, Some(oSortedArrays)),
    QueryDef("q_json_array", qJsonArray, Some(oJsonArray)),
    QueryDef("q_map_funcs", qMapFuncs, Some(oMapFuncs)),
    QueryDef("q_gaps_islands", qGapsIslands, Some(oGapsIslands)),
    QueryDef("q_corr_moments", qCorrMoments, Some(oCorrMoments)),
    QueryDef("q_nth_value", qNthValue, Some(oNthValue)),
    QueryDef("q_rel_division", qRelDivision, Some(oRelDivision)),
    QueryDef("q_bitwise_agg", qBitwiseAgg, Some(oBitwiseAgg)),
    QueryDef("q_time_weighted", qTimeWeighted, Some(oTimeWeighted)),
    QueryDef("q_ewma", qEwma, Some(oEwma)),
    QueryDef("q_business_days", qBusinessDays, Some(oBusinessDays)),
    QueryDef("q_allocation", qAllocation, Some(oAllocation)),
    QueryDef("q_max_concurrent", qMaxConcurrent, Some(oMaxConcurrent)),
    QueryDef("q_spatial_nn", qSpatialNn, Some(oSpatialNn)),
    QueryDef("q_inventory_balance", qInventoryBalance, Some(oInventoryBalance)),
    QueryDef("q_chi_squared", qChiSquared, Some(oChiSquared)),
    QueryDef("q_sequence_audit", qSequenceAudit, Some(oSequenceAudit)),
    QueryDef("q_ab_srm", qAbSrm, Some(oAbSrm)),
    QueryDef("q_forecast_backtest", qForecastBacktest, Some(oForecastBacktest)),
    QueryDef("q_decay_window", qDecayWindow, Some(oDecayWindow)),
    QueryDef("q_session_window", qSessionWindow, Some(oSessionWindow)),
    QueryDef("q_profile", qProfile, Some(oProfile)),
    QueryDef("q_pareto_share", qParetoShare, Some(oParetoShare)),
    QueryDef("q_hhi", qHhi, Some(oHhi)),
    QueryDef("q_weighted_median", qWeightedMedian, Some(oWeightedMedian)),
    QueryDef("q_new_vs_returning", qNewVsReturning, Some(oNewVsReturning)),
    QueryDef("q_abc_class", qAbcClass, Some(oAbcClass)),
    QueryDef("q_cohort_ltv", qCohortLtv, Some(oCohortLtv)),
    QueryDef("q_seasonal_index", qSeasonalIndex, Some(oSeasonalIndex)),
    QueryDef("q_fulfillment_latency", qFulfillmentLatency,
      Some(oFulfillmentLatency)),
    QueryDef("q_rank_movers", qRankMovers, Some(oRankMovers)),
    QueryDef("q_topk_with_ties", qTopkWithTies, Some(oTopkWithTies)),
    QueryDef("q_attribution_linear", qAttributionLinear,
      Some(oAttributionLinear)),
    QueryDef("q_boxplot", qBoxplot, Some(oBoxplot)),
    QueryDef("q_survival", qSurvival, Some(oSurvival)),
    QueryDef("q_fk_audit", qFkAudit, Some(oFkAudit)),
  )
}
