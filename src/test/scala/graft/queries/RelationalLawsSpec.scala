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

  test("eventPatternMatches: order ties break by event_id, deterministically") {
    // same timestamp everywhere: event_id alone defines the stream.
    // v c p in event_id order = one match even with equal us.
    val rows = ev((9L, 1L, 5L, "v"), (9L, 2L, 5L, "c"), (9L, 3L, 5L, "p"))
    val r = Relational.eventPatternMatches(rows).collect()
    assert(r.length === 1 && r.head.getLong(2) === 1L)
  }
}
