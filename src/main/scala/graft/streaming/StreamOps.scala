package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregation operators — the continuous counterparts of
  * the batch B9 time-window query (readStream → watermark → windowed
  * agg → append). Watermarking bounds state: a window's partial
  * aggregate is held only until event time passes
  * window.end + watermark, then finalized and evicted — the knob
  * that keeps 100 TB/day streams in bounded executor memory.
  */
object StreamOps {

  /** Tumbling-window counts + sums per (window, key). `tsCol` must be
    * a timestamp column; emits finalized windows only (append mode).
    */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Watermarked stream–stream interval join — the continuous
    * counterpart of the batch B16 operator (Temporal.intervalJoin):
    * left events pair with same-key right events whose event time is
    * within [left.ts − lookback, left.ts]. Both sides are
    * watermarked and the join condition carries the explicit time
    * range, which is what lets Spark bound the buffered state: a
    * side's rows are evicted once the other side's watermark passes
    * their ts + lookback + delay — without the range the state grows
    * forever. At scale each micro-batch shuffles only on the key, the
    * same plan as the batch join.
    *
    * Column contract: left (key, `lTs` timestamp, payload...), right
    * (key, `rTs` timestamp, payload...); both event-time columns must
    * be distinct names.
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      lTs: String, rTs: String, lookback: String, watermark: String): DataFrame = {
    val l = left.withWatermark(lTs, watermark)
    val r = right.withWatermark(rTs, watermark).withColumnRenamed(key, s"_r_$key")
    l.join(r,
      col(key) === col(s"_r_$key") &&
        col(rTs) >= col(lTs) - expr(s"INTERVAL $lookback") &&
        col(rTs) <= col(lTs))
      .drop(s"_r_$key")
  }

  final case class SessionEvent(key: Long, tsUs: Long)
  final case class SessionOut(key: Long, startUs: Long, endUs: Long, n: Long)
  final case class SessionState(startUs: Long, endUs: Long, n: Long)

  /** Streaming gap sessionization — the continuous counterpart of the
    * batch B14 operator (Temporal.sessionize): per key, events closer
    * than `gapUs` extend the open session; a session closes and emits
    * when a later event of the same key arrives past the gap, or —
    * with `idleTimeout=true` — when a processing-time timeout of the
    * gap elapses with no events. Custom state via
    * flatMapGroupsWithState: one (start, end, n) triple per open
    * key — state is O(active keys), the timeout is the eviction
    * policy, so an unbounded stream runs in bounded memory.
    * (`idleTimeout=false` gives a deterministic drain for tests and
    * replay jobs: trailing open sessions stay in state.)
    *
    * (Spark's built-in session_window needs a watermark-driven event
    * stream; this form also serves feeds without reliable event-time
    * watermarks, matching the batch operator's pos-tiebreak contract.)
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapUs: Long,
      idleTimeout: Boolean = true): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (key: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // gap elapsed with no events: close and emit the session
            val s = state.get
            state.remove()
            Iterator(SessionOut(key, s.startUs, s.endUs, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsUs - s.endUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, e.tsUs, s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(key, s.startUs, s.endUs, s.n)
                  cur = Some(SessionState(e.tsUs, e.tsUs, 1))
                case None =>
                  cur = Some(SessionState(e.tsUs, e.tsUs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (idleTimeout) state.setTimeoutDuration(gapUs / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  final case class DayObs(user: Long, day: Long)
  final case class WauDelta(day: Long, w: Long)
  final case class WauState(islands: List[(Long, Long)])

  /** Streaming-maintained trailing-window actives (B101's continuous
    * form — the live WAU board): per user, the state is the COVERAGE
    * ISLAND list ([s, e] runs of days < `window` apart — bounded by
    * calendar/window entries per user, never by traffic); each new
    * user-day that extends/creates/bridges islands emits sweep
    * boundary DELTAS (compensating ±1 pairs for replaced islands, new
    * pairs for the merged one; a day already inside an island emits
    * nothing). The per-day NET of all emitted deltas equals the batch
    * operator's boundary relation exactly — the calendar-bounded
    * running sum that finishes the curve is a metadata-sized batch
    * read over the accumulated net, the A26 streaming-rollup shape.
    * Append-mode output: deltas are facts, never retracted —
    * compensation is additive, so any sum over them is correct at
    * every prefix.
    */
  def wauDeltasStream(obs: Dataset[DayObs], window: Int): Dataset[WauDelta] = {
    import obs.sparkSession.implicits._
    val w = window.toLong
    obs.groupByKey(_.user)
      .flatMapGroupsWithState[WauState, WauDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[DayObs], state: GroupState[WauState]) =>
          var islands = state.getOption.map(_.islands).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[WauDelta]
          rows.map(_.day).toSeq.distinct.sorted.foreach { d =>
            if (!islands.exists(i => d >= i._1 && d <= i._2)) {
              // coverage-merge: same island iff the day gap < window
              val (merge, keep) = islands.partition(i =>
                d >= i._1 - (w - 1) && d <= i._2 + (w - 1))
              val ns = (d +: merge.map(_._1)).min
              val ne = (d +: merge.map(_._2)).max
              merge.foreach { case (s, e) =>
                out += WauDelta(s, -1L); out += WauDelta(e + w, 1L)
              }
              out += WauDelta(ns, 1L); out += WauDelta(ne + w, -1L)
              islands = ((ns, ne) :: keep).sortBy(_._1)
            }
          }
          state.update(WauState(islands))
          out.iterator
      }
  }

  /** Streaming near-dup ingestion (C48) — the continuous form of
    * C32's incremental MinHash loop: `readStream` over a landing
    * directory of document parquet; every micro-batch is LSH-hashed
    * ONCE, probed against the postings accumulated by all prior
    * batches, and appended — the corpus is never re-hashed, per-batch
    * cost ∝ batch (the 100 TB ingest loop, now with checkpointed
    * exactly-once batch tracking instead of a hand-rolled cursor).
    *
    * Output layout is overwrite-idempotent per micro-batch: pairs
    * land in `pairsDir/batch=<id>/`, postings in
    * `indexDir/batch=<id>/` — a crash-replayed batch rewrites the
    * identical content, so the union across batch dirs is
    * exactly-once without a transactional sink. `Trigger.AvailableNow`
    * drains everything present and stops (the scheduled-ingest mode);
    * rerunning with the same checkpoint processes only NEW landing
    * files.
    */
  def drainMinhashIngest(spark: org.apache.spark.sql.SparkSession,
      landingDir: String, indexDir: String, pairsDir: String,
      checkpoint: String,
      schema: org.apache.spark.sql.types.StructType,
      lsh: graft.ops.Dedup.MinHashLsh = graft.ops.Dedup.MinHashLsh()): Unit = {
    val q = spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val priorDirs = graft.cdc.StoreFs.listDirNames(indexDir)
          .filter(_.startsWith("batch="))
          // a replayed batch must probe the SAME prior state it saw
          // first time — its own (possibly torn) output is excluded
          .filter(_.stripPrefix("batch=").toLong != id)
          .map(d => s"$indexDir/$d")
        val index =
          if (priorDirs.isEmpty) graft.ops.Dedup.minhashEntries(batch.limit(0))
          else s.read.parquet(priorDirs: _*)
        val (pairs, entries) = graft.ops.Dedup.incrementalMinhash(batch, index, lsh = lsh)
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$id")
        entries.write.mode("overwrite").parquet(s"$indexDir/batch=$id")
        ()
      }
      .start()
    q.awaitTermination()
  }
}
