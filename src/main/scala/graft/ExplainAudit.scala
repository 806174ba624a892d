package graft
import org.apache.spark.sql.SparkSession

/** Plan-regression audit: prints a grep-able skeleton of every registered
  * query's physical plan (scans, exchanges, joins, aggregates, codegen
  * spans) plus a per-query `Scan parquet` count. Covers the FULL
  * `SparkEntry.queries` registry — not a hand-maintained list — so a new
  * gate is audited the day it lands. Output is committed as
  * `EXPLAIN_AUDIT.txt`; plan regressions show up as diffs.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    for (name <- names) {
      println(s"========== $name ==========")
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val kept = plan.linesIterator.filter(l =>
          l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("Exchange") ||
          l.contains("Broadcast") || l.contains("WholeStageCodegen") ||
          l.contains("HashAggregate") || l.contains("Join") ||
          l.contains("Sort") || l.contains("Sessions")).toSeq
        val scans = kept.count(_.contains("Scan parquet"))
        val reused = kept.count(_.contains("ReusedExchange"))
        println(s"-- scans=$scans reusedExchange=$reused")
        println(kept.mkString("\n"))
      } catch {
        case e: Exception =>
          println(s"-- PLAN FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
