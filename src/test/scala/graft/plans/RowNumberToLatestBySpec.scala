package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{LocalSpark, Tables => T}

class RowNumberToLatestBySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = LocalSpark.spark
    s.experimental.extraOptimizations = Seq(RowNumberToLatestBy)
    s
  }
  import spark.implicits._

  private def rnQuery() = {
    val ev = T.events(spark, LocalSpark.sf)
      .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_id", $"event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }

  test("ROW_NUMBER=1 compaction is rewritten to LatestByOrder aggregation") {
    val q = rnQuery()
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("latestbyorder"), optimized)
    assert(!optimized.contains("row_number"), optimized)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("ObjectHashAggregate"), physical)
    assert(!physical.toLowerCase.contains("window"), physical)
  }

  test("rewritten result equals the un-rewritten window result") {
    val got = rnQuery()
      .select($"user_id", $"ts_us", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // reference computation without the rule
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val want = try rnQuery()
      .select($"user_id", $"ts_us", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    finally spark.experimental.extraOptimizations = prev
    assert(got === want)
  }

  private def rnTopKQuery() = {
    val ev = T.events(spark, LocalSpark.sf)
      .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_id", $"event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    ev.withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
  }

  test("ROW_NUMBER<=k is rewritten to TopKByOrder aggregation + explode") {
    val q = rnTopKQuery()
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("topkbyorder"), optimized)
    assert(!optimized.contains("row_number"), optimized)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("ObjectHashAggregate"), physical)
    assert(!physical.toLowerCase.contains("window"), physical)
  }

  test("rewritten top-k result equals the un-rewritten window result") {
    def rows() = rnTopKQuery()
      .select($"user_id", $"ts_us", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val got = rows()
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val want = try rows() finally spark.experimental.extraOptimizations = prev
    assert(got === want)
  }

  test("a projection that uses the rank is left alone") {
    val ev = T.events(spark, LocalSpark.sf)
      .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    val q = ev.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"user_id", $"rn")
    assert(q.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(q.count() > 0)
  }

  test("ascending or single-key orderings are left alone") {
    val ev = T.events(spark, LocalSpark.sf)
      .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".desc)
    val q = ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    assert(q.queryExecution.optimizedPlan.toString.contains("row_number"))
    // and it still runs
    assert(q.count() > 0)
  }
}
