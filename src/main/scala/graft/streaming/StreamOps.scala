package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
