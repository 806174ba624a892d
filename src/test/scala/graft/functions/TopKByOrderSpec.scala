package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark

/** TopKByOrder: equivalence with the window form, plan shape, and
  * the k-bounded buffer's edge cases.
  */
class TopKByOrderSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy($"g")
    .agg(TopKByOrder(struct($"id", $"v"), $"v", $"id", k).as("top"))
    .select($"g", posexplode($"top").as(Seq("pos", "r")))
    .select($"g", $"pos", $"r.id".as("id"), $"r.v".as("v"))

  test("matches window row_number ordering with ties broken by id") {
    val df = Seq(
      (1L, 1L, 10L), (1L, 2L, 30L), (1L, 3L, 30L), (1L, 4L, 20L), (1L, 5L, 5L),
      (2L, 6L, 7L)).toDF("g", "id", "v")
    val got = topk(df, 3).as[(Long, Int, Long, Long)].collect().toSeq.sorted
    // g=1: v desc, id asc -> (2,30),(3,30),(4,20); g=2: only (6,7)
    assert(got === Seq(
      (1L, 0, 2L, 30L), (1L, 1, 3L, 30L), (1L, 2, 4L, 20L),
      (2L, 0, 6L, 7L)).sorted)
  }

  test("fewer rows than k returns them all; k=1 equals latest_by shape") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("g", "id", "v")
    assert(topk(df, 5).count() === 2)
    val best = topk(df, 1).select($"id").as[Long].collect().toSeq
    assert(best === Seq(2L))
  }

  test("plans as ObjectHashAggregate with partial combine, no sort") {
    val df = Seq((1L, 1L, 10L)).toDF("g", "id", "v")
    val plan = topk(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topkbyorder"), plan)
    assert(!plan.toLowerCase.contains("sortaggregate"), plan)
  }

  test("survives shuffle serialization at scale-ish cardinality") {
    val df = spark.range(0, 100000)
      .select((col("id") % 100).as("g"), col("id").as("id"), (col("id") * 7 % 1000).as("v"))
    val got = topk(df, 5)
    assert(got.count() === 500)
    // spot-check group 0's best: ids with v max (id*7%1000 == 994 ... compute via window for truth
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id"))
    val truth = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "id").as[(Long, Long)].collect().toSet
    val ours = got.select("g", "id").as[(Long, Long)].collect().toSet
    assert(ours === truth)
  }
}
