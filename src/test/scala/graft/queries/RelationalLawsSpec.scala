package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** Laws for relational operators whose semantics deserve planted
  * inputs beyond the DuckDB oracle gate (the oracle proves engine
  * equality on the synthetic corpus; these prove the DEFINITION on
  * adversarial sequences the corpus may not contain).
  */
class RelationalLawsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "us", "sym")

  test("clampedBalance: planted clamp chains + randomized scalar-replay law") {
    // planted: the clamp is ORDER-sensitive — issue-before-receipt
    // floors at 0 and the receipt starts fresh, so the same multiset
    // of deltas yields different finals under different day orders
    val planted = Seq(
      (1L, 1L, 1L, 1L, -5L), (1L, 2L, 1L, 1L, 3L),   // -5 floors, +3 -> 3
      (2L, 1L, 1L, 1L, 3L), (2L, 2L, 1L, 1L, -5L),   // 3 then -5 -> 0
      (3L, 1L, 1L, 1L, -7L),                           // all-negative -> 0
      (4L, 1L, 1L, 1L, 2L), (4L, 1L, 1L, 2L, -9L),    // same day, ln tie-break
      (4L, 2L, 1L, 1L, 4L))
      .toDF("k", "day", "ok", "ln", "delta")
    val got = Relational.clampedBalance(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 4L))

    // law: for seeded random histories the distributed fold equals a
    // scalar foldLeft over the same total order
    val rnd = new scala.util.Random(20260815L)
    val rows = (1 to 400).map { i =>
      (i.toLong % 13, rnd.nextInt(30).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(4).toLong, (rnd.nextInt(21) - 11).toLong)
    }
    val df = rows.toDF("k", "day", "ok", "ln", "delta")
    val dist = Relational.clampedBalance(df).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val model = rows.groupBy(_._1).map { case (k, evs) =>
      k -> evs.sortBy(e => (e._2, e._3, e._4, e._5))
        .foldLeft(0L)((s, e) => math.max(0L, s + e._5))
    }
    assert(dist === model)
  }

  test("clampedBalanceSegmented ≡ clampedBalance: composition law under every segment width") {
    // The segmented fold relies on f_δ(s)=max(0,s+δ) composing as
    // f(s)=max(b,s+a). Prove distributed-segmented ≡ distributed-
    // sequential ≡ scalar replay on seeded random histories, across
    // segment widths that put boundaries everywhere (1 = every day
    // its own segment, 7/30 = mid-history cuts, 1000 = one segment,
    // i.e. degenerate to the sequential fold).
    val rnd = new scala.util.Random(20260815L)
    val rows = (1 to 600).map { i =>
      (i.toLong % 17, rnd.nextInt(90).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(4).toLong, (rnd.nextInt(21) - 11).toLong)
    }
    val df = rows.toDF("k", "day", "ok", "ln", "delta")
    val model = rows.groupBy(_._1).map { case (k, evs) =>
      k -> evs.sortBy(e => (e._2, e._3, e._4, e._5))
        .foldLeft(0L)((s, e) => math.max(0L, s + e._5))
    }
    // non-vacuity: the clamp must actually BIND for some keys (final
    // differs from max(0, plain sum)), or the law proves nothing
    val plain = rows.groupBy(_._1).map { case (k, evs) =>
      k -> math.max(0L, evs.map(_._5).sum)
    }
    assert(model.count { case (k, v) => v != plain(k) } > 0,
      "fixture degenerate: clamp never changed any key's answer")
    for (w <- Seq(1L, 7L, 30L, 1000L)) {
      val seg = Relational.clampedBalanceSegmented(df, w).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      assert(seg.view.mapValues(_._4).toMap === model, s"segWidth=$w")
      // the ride-along sums must survive the two-level rollup too
      val sums = rows.groupBy(_._1).map { case (k, evs) =>
        k -> ((evs.size.toLong, evs.map(_._5).filter(_ > 0).sum,
          -evs.map(_._5).filter(_ < 0).sum))
      }
      assert(seg.view.mapValues(t => (t._1, t._2, t._3)).toMap === sums,
        s"segWidth=$w rollup sums")
    }
    // adversarial boundary: a floor-then-recover chain SPLIT exactly at
    // a segment boundary (the case a naive prefix-sum rewrite gets
    // wrong): -5 on day 0 floors, +3 on day 1 lands in segment 2 at w=1
    val planted = Seq((1L, 0L, 1L, 1L, -5L), (1L, 1L, 1L, 1L, 3L))
      .toDF("k", "day", "ok", "ln", "delta")
    for (w <- Seq(1L, 2L)) {
      val r = Relational.clampedBalanceSegmented(planted, w).collect()
      assert(r.head.getLong(4) === 3L, s"boundary split at segWidth=$w")
    }
  }

  test("peakConcurrency: planted overlaps + randomized day-count law") {
    // planted: inclusive endpoints — an interval ending on day d
    // still counts on d; peak_day is the FIRST day attaining the peak
    val planted = Seq(
      (1L, 1L, 4L), (1L, 3L, 6L), (1L, 3L, 3L),  // days 3: all 3 live
      (2L, 1L, 1L), (2L, 3L, 3L))                 // disjoint -> peak 1 at day 1
      .toDF("k", "d0", "d1").withColumn("d1x", col("d1") + 1L).drop("d1")
    val got = Relational.peakConcurrency(planted).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(1L -> ((3L, 3L, 3L)), 2L -> ((1L, 1L, 2L))))

    // law: peak equals the brute-force per-day occupancy maximum
    val rnd = new scala.util.Random(42L)
    val ivs = (1 to 300).map { _ =>
      val d0 = rnd.nextInt(50).toLong
      (rnd.nextInt(7).toLong, d0, d0 + rnd.nextInt(10).toLong)
    }
    val df = ivs.toDF("k", "d0", "d1").withColumn("d1x", col("d1") + 1L).drop("d1")
    val dist = Relational.peakConcurrency(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val model = ivs.groupBy(_._1).map { case (k, xs) =>
      k -> (0L to 60L).map(day => xs.count(x => x._2 <= day && day <= x._3).toLong).max
    }
    assert(dist === model)
  }

  test("eventPatternMatches: planted sequences match exactly the v c+ p definition") {
    // user 1: v c c p  → one match, 2 clicks, span 30
    // user 2: v c s p  → signup breaks contiguity: no match
    // user 3: v p      → no click: no match
    // user 4: v c p v c c c p → two segments, two matches, 1+3 clicks
    // user 5: c p v c p → pre-view prefix ignored; one match
    // user 6: v c p c p → only the FIRST p closes (skip-past: extra
    //         c p after the match does not double-count)
    val rows = ev(
      (1L, 1L, 10L, "v"), (1L, 2L, 20L, "c"), (1L, 3L, 30L, "c"), (1L, 4L, 40L, "p"),
      (2L, 1L, 10L, "v"), (2L, 2L, 20L, "c"), (2L, 3L, 30L, "s"), (2L, 4L, 40L, "p"),
      (3L, 1L, 10L, "v"), (3L, 2L, 20L, "p"),
      (4L, 1L, 10L, "v"), (4L, 2L, 20L, "c"), (4L, 3L, 30L, "p"),
      (4L, 4L, 40L, "v"), (4L, 5L, 50L, "c"), (4L, 6L, 60L, "c"),
      (4L, 7L, 70L, "c"), (4L, 8L, 80L, "p"),
      (5L, 1L, 10L, "c"), (5L, 2L, 20L, "p"),
      (5L, 3L, 30L, "v"), (5L, 4L, 40L, "c"), (5L, 5L, 50L, "p"),
      (6L, 1L, 10L, "v"), (6L, 2L, 20L, "c"), (6L, 3L, 30L, "p"),
      (6L, 4L, 40L, "c"), (6L, 5L, 50L, "p"))
    val r = Relational.eventPatternMatches(rows).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) === ((1L, 1L, 2L, 30L)))
    assert(r(2L) === ((1L, 0L, 0L, 0L)))
    assert(r(3L) === ((1L, 0L, 0L, 0L)))
    assert(r(4L) === ((2L, 2L, 4L, 20L + 40L)))
    assert(r(5L) === ((1L, 1L, 1L, 20L)))
    assert(r(6L) === ((1L, 1L, 1L, 20L)))
  }

  test("rollingMadAnomalies: hand-computed medians/MADs; spike flags, level shift absorbs") {
    // user 1: steady 100s, one 10x spike at t=5, steady after — the
    // spike flags (|1000-100| > 5*0), wait: MAD=0 guard... plant
    // non-constant history so MAD>0: values alternate 100/102.
    val base = (1L to 9L).map(i =>
      (1L, i, i * 10L, if (i % 2 == 0) 102L else 100L))
    val rows = (base :+ ((1L, 10L, 100L, 1000L)))
      .toDF("user_id", "event_id", "us", "v_c")
    val r = Relational.rollingMadAnomalies(rows, window = 20, k = 5)
      .collect().map(x => x.getLong(1) -> x).toMap
    // at event 10: frame = 5x100, 4x102, 1000 sorted → median = 100
    // (lower median of 10 = 5th), deviations sorted: 0,0,0,0,0,2,2,2,2,900
    // → MAD = 0 at the 5th... recompute: (10+1)/2 = 5 → dev[5] = 0.
    // MAD=0 guard suppresses — document the guard in the assertion.
    assert(r(10L).getLong(3) === 100L && r(10L).getLong(4) === 0L)
    assert(!r(10L).getBoolean(5), "MAD=0 frames never flag by design")
    // make MAD positive: window=4 → frame at event 10 = last 5 values
    // {102,100,102,100,1000}... sorted {100,100,102,102,1000}: med=102,
    // devs {0,0,2,2,898} sorted → mad=2; |1000-102|=898 > 10 → flags
    val r4 = Relational.rollingMadAnomalies(rows, window = 4, k = 5)
      .collect().map(x => x.getLong(1) -> x).toMap
    assert(r4(10L).getLong(3) === 102L && r4(10L).getLong(4) === 2L)
    assert(r4(10L).getBoolean(5), "the spike must flag against live MAD")
    // steady rows never flag
    assert((1L to 9L).forall(i => !r4(i).getBoolean(5)))
    // singleton frame: median = the value itself, MAD 0, no flag
    assert(r4(1L).getLong(3) === 100L && !r4(1L).getBoolean(5))
  }

  test("experimentAb: exposure gating, deterministic variants, hand-checked chi-square") {
    // pick user ids whose variant we derive with the same formula the
    // operator uses, then plant conversions to a known 2x2 table
    def variantA(u: Long): Boolean = (u * 554862419L) % 1000000L < 500000L
    val users = (1L to 40L)
    val as = users.filter(variantA)
    val bs = users.filterNot(variantA)
    assert(as.nonEmpty && bs.nonEmpty, "both variants must be populated")
    // all users exposed (view at t=10); conversions: every A user,
    // no B user. One B user purchases BEFORE the view (must not count)
    // and one unexposed user purchases (must be excluded entirely).
    val rows =
      users.map(u => (u, "view", 10L)) ++
        as.map(u => (u, "purchase", 20L)) ++
        Seq((bs.head, "purchase", 5L), (999L, "purchase", 30L))
    val r = Relational.experimentAb(
      rows.toDF("user_id", "event_type", "us")).collect()(0)
    val (na, ca, nb, cb) = (as.size.toLong, as.size.toLong, bs.size.toLong, 0L)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((na, ca, nb, cb)))
    assert(r.getLong(4) === 1000000L && r.getLong(5) === 0L)
    assert(r.getLong(6) === 1000000L)
    // chi2 for the fully-separated table: N*(ad-bc)^2/(n_a*n_b*(a+c)*(b+d))
    val nn = na + nb
    val det = ca * (nb - cb) - (na - ca) * cb
    val den = math.max(na * nb * (ca + cb) * (na - ca + nb - cb), 1L)
    val expected = (nn * det * det / den) * 1000L +
      ((nn * det * det % den) * 1000L) / den
    assert(r.getLong(7) === expected)
    // perfectly separated 2x2 has chi2 = N exactly: sanity anchor
    assert(expected === nn * 1000L)
  }

  test("wowDeltas: ppm arithmetic incl. negative truncation; first week NULL; zero guard") {
    val weekly = Seq(
      (1L, 100L, 5L), (2L, 300L, 7L), (3L, 100L, 2L), (4L, 0L, 0L), (5L, 50L, 1L)
    ).toDF("week", "rev_c", "n_orders")
    val r = Relational.wowDeltas(weekly).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).isNullAt(4), "first period has no prior")
    assert(r(2L).getLong(4) === 2000000L) // +200%
    // -200/300: truncation toward zero gives -666666 (floor would be
    // -666667) — THE case that distinguishes the two engines' DIV
    assert(r(3L).getLong(4) === -666666L)
    assert(r(4L).getLong(4) === -1000000L)
    assert(r(5L).isNullAt(4), "division by a zero prior is NULL, not an error")
  }

  test("pathTransitions: gap rule, last-event emits nothing, per-from ppm") {
    val events = Seq(
      // user 1: a→b (in gap), b→c (in gap), c is last
      (1L, 1L, 0L, "a"), (1L, 2L, 100L, "b"), (1L, 3L, 200L, "c"),
      // user 2: a→b but BEYOND the gap → no transition; b→b in gap
      (2L, 1L, 0L, "a"), (2L, 2L, 5000L, "b"), (2L, 3L, 5100L, "b"),
      // user 3: a→c (another a-transition, to pin the ppm denominator)
      (3L, 1L, 0L, "a"), (3L, 2L, 50L, "c")
    ).toDF("user_id", "event_id", "us", "event_type")
    val r = Relational.pathTransitions(events, gapUs = 1000L).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(("a", "b")) === ((1L, 2L, 500000L)))
    assert(r(("a", "c")) === ((1L, 2L, 500000L)))
    // from-state 'b' totals 2 transitions ACROSS users (1 b→c, 1 b→b)
    assert(r(("b", "c")) === ((1L, 2L, 500000L)))
    assert(r(("b", "b")) === ((1L, 2L, 500000L)))
    assert(r.size === 4, "out-of-gap and stream-final pairs emit nothing")
  }

  test("lastTouchAttribution: lookback window, direct fallbacks, shared touch, ppm shares") {
    val events = Seq(
      (1L, 1L, 0L, "click"), (1L, 2L, 50L, "purchase"),   // attributed: click
      (2L, 1L, 0L, "view"), (2L, 2L, 5000L, "purchase"),  // out of window: direct
      (3L, 1L, 0L, "purchase"),                           // no prior touch: direct
      // two purchases share ONE view touch (both within window)
      (4L, 1L, 0L, "view"), (4L, 2L, 10L, "purchase"), (4L, 3L, 20L, "purchase")
    ).toDF("user_id", "event_id", "us", "event_type")
    val r = Relational.lastTouchAttribution(events, lookbackUs = 1000L)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("click") === ((1L, 200000L)))
    assert(r("direct") === ((2L, 400000L)))
    assert(r("view") === ((2L, 400000L)))
    assert(r.values.map(_._1).sum === 5L)
  }

  test("eventPatternMatches: order ties break by event_id, deterministically") {
    // same timestamp everywhere: event_id alone defines the stream.
    // v c p in event_id order = one match even with equal us.
    val rows = ev((9L, 1L, 5L, "v"), (9L, 2L, 5L, "c"), (9L, 3L, 5L, "p"))
    val r = Relational.eventPatternMatches(rows).collect()
    assert(r.length === 1 && r.head.getLong(2) === 1L)
  }

  test("trendForecast: exact line is recovered exactly; day-shift invariance") {
    // y = 1000 + 250·x planted on days 100..104 for group "lin";
    // slope must come out exactly 250000 milli-cents/day and the
    // forecast exactly 1000 + 250·5 = 2250 (the fit is exact, so
    // every truncation step divides cleanly).
    val lin = (0L to 4L).map(x => ("lin", 100L + x, 1000L + 250L * x))
    // group "flat": constant 700 → slope 0, forecast 700.
    val flat = (0L to 3L).map(x => ("flat", 100L + x, 700L))
    val r = Relational.trendForecast((lin ++ flat).toDF("prio", "day", "y_c"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("lin").getLong(2) === 250000L)
    assert(r("lin").getLong(4) === 2250L)
    assert(r("flat").getLong(2) === 0L)
    assert(r("flat").getLong(4) === 700L)
    // shift the calendar by 10 000 days: slope and forecast identical
    val shifted = Relational.trendForecast(
      (lin ++ flat).map { case (p, d, y) => (p, d + 10000L, y) }
        .toDF("prio", "day", "y_c"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(shifted("lin").getLong(2) === 250000L)
    assert(shifted("lin").getLong(4) === 2250L)
  }

  test("trendForecast: negative slope truncates toward zero in the milli step") {
    // y = 1000 − 100·x/3-ish: days 0,1,2 with y 1000, 999, 997 →
    // n=3 Sx=3 Sy=2996 Sxy=2993 Sxx=5; num=3·2993−3·2996=−9, den=6
    // → slope = −9/6 = −1.5 → two-step: (−9 DIV 6)·1000 +
    // ((−9 % 6)·1000) DIV 6 = −1000 + (−3000 DIV 6) = −1500.
    val r = Relational.trendForecast(
      Seq(("g", 0L, 1000L), ("g", 1L, 999L), ("g", 2L, 997L))
        .toDF("prio", "day", "y_c")).collect()
    assert(r.head.getLong(2) === -1500L)
  }

  test("benfordAudit: planted digit counts yield exact ppm and deviation rows") {
    // 301029 ppm expected for digit 1; plant 3 ones, 1 two, 1 nine
    // out of 5 values → obs 600000, 200000, 200000.
    val cents = Seq(100L, 17L, 1999L, 2L, 9L).toDF("cents")
    val r = Relational.benfordAudit(cents).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(1L, 2L, 9L))
    assert(r(1L).getLong(1) === 3L && r(1L).getLong(2) === 600000L)
    assert(r(1L).getLong(3) === 301029L)
    assert(r(1L).getLong(4) ===
      (600000L - 301029L) * (600000L - 301029L) / 301029L)
    assert(r(9L).getLong(3) === 45757L)
    // a single-digit corpus saturates obs_ppm at exactly 1e6
    val exact = Relational.benfordAudit(
      (1 to 10).map(_ => 100L).toDF("cents")).collect()
    assert(exact.length === 1 && exact.head.getLong(2) === 1000000L)
  }

  test("cusumChangepoint: planted level shift peaks exactly at the shift day") {
    // 10,10,10 then 20,20,20: total 90, n 6 → dev = ±30,
    // S = −30,−60,−90,−60,−30,0 → unique peak |S|=90 at day 3.
    val daily = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("day", "y_c")
    val r = Relational.cusumChangepoint(daily).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(3L).getLong(2) === -90L && r(3L).getLong(3) === 1L)
    assert(Seq(1L, 2L, 4L, 5L, 6L).forall(d => r(d).getLong(3) === 0L))
    assert(r(6L).getLong(2) === 0L, "CUSUM returns to zero at the end")
    // flat series: every partial sum is 0 → every day ties the peak
    val flat = Relational.cusumChangepoint(
      Seq((1L, 5L), (2L, 5L)).toDF("day", "y_c")).collect()
    assert(flat.forall(x => x.getLong(2) === 0L && x.getLong(3) === 1L))
  }

  test("rfmSegments: boundary quintiles, tie-heavy frequency collapses, recency inversion") {
    // five customers: distinct monetary 100..500 staircases m 1..5;
    // freq ties [1,1,1,1,2] → all boundaries 1, so freq=1 → f 1 and
    // freq=2 → f 5 (boundary-equal falls LOW); recency 0..4 days →
    // r 5..1 inverted.
    val orders = Seq(
      (1L, 10L, 100L), (2L, 9L, 200L), (3L, 8L, 300L), (4L, 7L, 400L),
      (5L, 6L, 250L), (5L, 5L, 250L)
    ).toDF("custkey", "day", "cents")
    val r = Relational.rfmSegments(orders).collect()
      .map(x => x.getLong(0) -> x.getLong(7)).toMap
    assert(r === Map(1L -> 511L, 2L -> 412L, 3L -> 313L, 4L -> 214L,
      5L -> 155L))
  }

  test("windowActives: merge-at-gap-6, split-at-gap-7 cancels, no double count") {
    // u1: days 0,7 — gap 7 → two islands with ADJACENT coverage
    //     ([0,6],[7,13]): the −1/+1 boundaries at day 7 must cancel
    // u2: days 0,6 — gap 6 → ONE island ([0,12]): split would
    //     double-count u2 on days 6..6+… the law pins it at 1
    // u3: day 5 — single-event coverage [5,11]
    val ud = Seq((1L, 0L), (1L, 7L), (2L, 0L), (2L, 6L), (3L, 5L))
      .toDF("user_id", "day")
    val got = Relational.windowActives(ud, 7)
      .as[(Long, Long)].collect().toSeq
    val exp = (0L to 13L).map { d =>
      val u1 = d >= 0 && d <= 13
      val u2 = d <= 12
      val u3 = d >= 5 && d <= 11
      (d, Seq(u1, u2, u3).count(identity).toLong)
    }
    assert(got === exp)
  }

  test("mannWhitney: separation, all-tied, hand-computed ties, U2 complement law") {
    def mw(rows: (Long, Boolean)*) = {
      val r = Relational.mannWhitney(rows.toDF("v", "va")).head()
      (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("u2_a"),
        r.getAs[Long]("u2_b"), r.getAs[Long]("auc_a_ppm"))
    }
    // perfect separation, no ties: A={3,4} > B={1,2} → U_a = n_a·n_b, AUC 1
    assert(mw((3L, true), (4L, true), (1L, false), (2L, false)) ===
      ((2L, 2L, 8L, 0L, 1000000L)))
    // all observations tied → avg ranks → AUC exactly 1/2
    assert(mw((7L, true), (7L, true), (7L, false)) ===
      ((2L, 1L, 2L, 2L, 500000L)))
    // hand-computed tie mix: A={1,2}, B={2,3}; ranks 1,(2.5,2.5),4 →
    // R_a = 3.5 → R2_a = 7, U2_a = 7 − 6 = 1, U2_b = 2·4−1 = 7,
    // AUC = 0.5/4 = 125000 ppm
    assert(mw((1L, true), (2L, true), (2L, false), (3L, false)) ===
      ((2L, 2L, 1L, 7L, 125000L)))
    // complement law on an arbitrary pool: U2_a + U2_b = 2·n_a·n_b
    val pool = Seq((5L, true), (5L, false), (2L, true), (9L, false),
      (9L, true), (1L, false), (5L, true))
    val (na, nb, ua, ub, _) = mw(pool: _*)
    assert(ua + ub === 2 * na * nb)
  }
}
