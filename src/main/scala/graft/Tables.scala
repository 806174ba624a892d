package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test tables
  * (see TESTDATA.md). All queries take the sf directory as a
  * parameter so the same code runs at any scale factor.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
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
