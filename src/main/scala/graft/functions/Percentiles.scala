package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.PercentileDisc

/** Multi-boundary discrete percentiles from ONE aggregation buffer.
  *
  * `percentile_disc(p) WITHIN GROUP (ORDER BY x)` is an object
  * aggregate whose buffer is a (value → count) map of EVERY input row;
  * k separate calls in one agg build k independent copies of that
  * buffer and update each per row (the r14 baseline's cost on
  * q_equidepth_hist / q_boxplot / q_rfm). Catalyst's PercentileDisc
  * inherits PercentileBase's ARRAY-percentage form (one buffer, k
  * boundary reads at eval time) — it just isn't reachable through the
  * WITHIN GROUP SQL syntax. This helper constructs it directly.
  *
  * Exactness: the buffer contents are identical to the scalar form's,
  * and each boundary is evaluated by the same `getPercentile` — the
  * k-element array is bit-for-bit the k scalar results.
  * `legacyCalculation` is left at its constructor default, which reads
  * the same SQLConf flag the SQL parser path reads.
  */
object Percentiles {
  def percentileDiscArray(ord: Column, pcts: Seq[Double]): Column =
    toCol(PercentileDisc(toExpr(ord),
      CreateArray(pcts.map(p => Literal(p)))).toAggregateExpression())
}
