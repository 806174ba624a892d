package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.LocalSpark
import graft.queries.Relational

/** B101's continuous form: streaming-maintained WAU boundary deltas
  * (`StreamOps.wauDeltasStream`) — kill+resume over a file source,
  * island bridging and duplicate re-sends in-stream, final net
  * compared day-by-day against the batch operator's curve.
  */
class WauStreamSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("streaming WAU deltas: kill+resume net equals the batch curve; bridge + dup in-stream") {
    val inDir = Files.createTempDirectory("graft-wau-in").toString
    val outDir = Files.createTempDirectory("graft-wau-out").toString
    val ckpt = Files.createTempDirectory("graft-wau-ckpt").toString

    // batch 1: u1 two separate islands (gap 10 ≥ 7), u2 one day
    Files.write(java.nio.file.Paths.get(inDir, "f1.jsonl"),
      Seq("""{"user":1,"day":0}""", """{"user":1,"day":10}""",
        """{"user":2,"day":3}""").mkString("\n").getBytes)

    def startQuery() = {
      val obs = spark.readStream
        .schema("user LONG, day LONG")
        .json(inDir)
        .as[StreamOps.DayObs]
      StreamOps.wauDeltasStream(obs, 7).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // kill + resume: day 5 BRIDGES u1's two islands into [0,10] (the
    // compensating deltas must cancel the old boundaries), day 0 is a
    // duplicate re-send (must emit nothing), day 4 extends u2
    Files.write(java.nio.file.Paths.get(inDir, "f2.jsonl"),
      Seq("""{"user":1,"day":5}""", """{"user":1,"day":0}""",
        """{"user":2,"day":4}""").mkString("\n").getBytes)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val net = spark.read.parquet(outDir)
      .groupBy("day").agg(sum("w").as("net"))
      .filter(col("net") =!= 0L)
      .as[(Long, Long)].collect().toMap
    // final islands: u1 [0,10] → +1@0 −1@17; u2 [3,4] → +1@3 −1@11
    assert(net === Map(0L -> 1L, 17L -> -1L, 3L -> 1L, 11L -> -1L))

    // the swept streaming net equals the batch operator's curve
    val userDays = Seq((1L, 0L), (1L, 10L), (2L, 3L), (1L, 5L), (2L, 4L))
      .toDF("user_id", "day").distinct()
    val batch = Relational.windowActives(userDays, 7)
      .as[(Long, Long)].collect().toSeq
    var run = 0L
    val streamedCurve = batch.map { case (d, _) =>
      run += net.getOrElse(d, 0L); (d, run)
    }
    assert(streamedCurve === batch)
  }
}
