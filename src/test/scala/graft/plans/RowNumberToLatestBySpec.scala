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

  test("top-k rewrite keeps the window's rows when ord1 ties straddle the k boundary") {
    // All six rows tie on ord1, so membership in the top 3 is decided
    // entirely by the DESC tiebreak: the window keeps ord2 = 6, 5, 4.
    // (This is the ADVICE r2 case: an ASC-tiebreak aggregate would
    // keep 1, 2, 3 — silently different results.)
    def q() = {
      val df = Seq((1L, 100L, 1L), (1L, 100L, 2L), (1L, 100L, 3L),
        (1L, 100L, 4L), (1L, 100L, 5L), (1L, 100L, 6L))
        .toDF("pk", "ord1", "ord2")
      val w = Window.partitionBy($"pk").orderBy($"ord1".desc, $"ord2".desc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
    }
    val got = q()
    assert(got.queryExecution.optimizedPlan.toString.contains("topkbyorder"))
    assert(got.select($"ord2").as[Long].collect().sorted.toSeq === Seq(4L, 5L, 6L))
    // and k = 1 agrees with the same direction (largest ord2 wins)
    def q1() = {
      val df = Seq((1L, 100L, 1L), (1L, 100L, 9L)).toDF("pk", "ord1", "ord2")
      val w = Window.partitionBy($"pk").orderBy($"ord1".desc, $"ord2".desc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    }
    assert(q1().select($"ord2").as[Long].collect().toSeq === Seq(9L))
  }

  test("timestamp-ordered rn=1 is rewritten with sub-second order preserved") {
    // The reference idiom orders by an event timestamp (merge.sql:310).
    // Sub-second differences must survive the long encoding — a CAST
    // would floor to seconds and pick the wrong row here.
    def q() = {
      val df = Seq(
        (1L, "2024-01-01 00:00:00.000001", "old"),
        (1L, "2024-01-01 00:00:00.000002", "new"),
        (2L, "2024-01-01 00:00:01.5", "only"))
        .toDF("pk", "ts_s", "v")
        .select($"pk", $"ts_s".cast("timestamp").as("ts"), $"v", lit(0).as("pos"))
      val w = Window.partitionBy($"pk").orderBy($"ts".desc, $"pos".desc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    }
    val got = q()
    val optimized = got.queryExecution.optimizedPlan.toString
    assert(optimized.contains("latestbyorder"), optimized)
    assert(!optimized.contains("row_number"), optimized)
    assert(got.select($"pk", $"v").as[(Long, String)].collect().sortBy(_._1).toSeq ===
      Seq((1L, "new"), (2L, "only")))
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
