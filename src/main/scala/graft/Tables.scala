package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated test tables
  * (see TESTDATA.md). All queries take the sf directory as a
  * parameter so the same code runs at any scale factor.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's `events.ts` has shipped as TIMESTAMP(NANOS) (which
    * the `nanosAsLong` session flag surfaces as BIGINT nanos) and as
    * TIMESTAMP(MICROS). Canonical form engine-wide is BIGINT
    * epoch-NANOS — the CDC envelope's source-commit-time contract —
    * so normalize whatever generation is on disk to that: every query,
    * spec, and DuckDB oracle (which sees the timestamp column and
    * truncates with `epoch_us`) stays unchanged across regenerations.
    * Naive (NTZ) timestamps are instants under the engine's pinned
    * UTC session timezone.
    */
  private[graft] def tsToNanos(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def events(s: SparkSession, d: String): DataFrame    = tsToNanos(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One correctness-gated query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver runs
  * on the same parquet tables. Column names/aliases MUST match
  * between the two — the driver sorts columns by name and hashes
  * values. All exported values are chosen bit-deterministic
  * (integers, strings, or round()-ed arithmetic): see SURVEY.md §5.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
