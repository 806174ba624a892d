package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.LocalSpark
import graft.cdc.{CdcEnvelope, ChangeCompaction, SnapshotMerge}
import java.nio.file.Files

class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val valueSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private val records = Seq(
    // id 1: create then update
    """{"op":"c","ts_ms":1000,"source":{"pos":1,"ts_ms":1000},"after":{"id":1,"v":"a"},"before":null}""",
    """{"op":"u","ts_ms":2000,"source":{"pos":2,"ts_ms":2000},"after":{"id":1,"v":"b"},"before":{"id":1,"v":"a"}}""",
    // id 2: create then delete (payload comes from `before`)
    """{"op":"c","ts_ms":1000,"source":{"pos":3,"ts_ms":1000},"after":{"id":2,"v":"x"},"before":null}""",
    """{"op":"d","ts_ms":3000,"source":{"pos":4,"ts_ms":3000},"after":null,"before":{"id":2,"v":"x"}}""",
    // id 3: snapshot read (op r)
    """{"op":"r","ts_ms":500,"source":{"pos":5,"ts_ms":500},"after":{"id":3,"v":"s"},"before":null}""")

  test("Debezium JSON lines → envelope → merged snapshot") {
    val dir = Files.createTempDirectory("graft-feed")
    Files.writeString(dir.resolve("feed.jsonl"), records.mkString("\n"))
    val env = ChangeFeed.debeziumJsonLines(spark, dir.toString, valueSchema, Seq("id"))

    assert(env.columns.toSet === Set("id", CdcEnvelope.OpCol, CdcEnvelope.TsCol,
      CdcEnvelope.PosCol, CdcEnvelope.LoadTsCol, CdcEnvelope.DataCol))
    val ops = env.select("id", CdcEnvelope.OpCol).as[(Long, String)].collect().toSeq
    assert(ops.count(_._2 == "d") === 1)
    assert(ops.count(_._2 == "u") === 4, "c/u/r all map to upsert")

    val snap = SnapshotMerge.fromHistory(env, Seq("id"),
      Seq("id", CdcEnvelope.DataCol))
    val got = snap.select(col("id"),
        get_json_object(col(CdcEnvelope.DataCol), "$.v").as("v"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, "b"), (3L, "s")), "id 2 deleted, id 1 at latest value")
  }

  test("streaming variant reads the same feed incrementally") {
    val dir = Files.createTempDirectory("graft-feed2")
    Files.writeString(dir.resolve("feed.jsonl"), records.mkString("\n"))
    val env = ChangeFeed.debeziumJsonLinesStream(spark, dir.toString, valueSchema, Seq("id"))
    assert(env.isStreaming)
    val q = env.writeStream.format("memory").queryName("feed_out").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt4").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("feed_out").count() === records.length)
  }

  test("Kafka frame → envelope: offset fallback for pos, broker timestamp as load ts") {
    // spark-sql-kafka column shape; source.pos absent → pos = offset
    val rows = Seq(
      (7L, 1000L, """{"op":"c","ts_ms":1000,"source":{"ts_ms":1000},"after":{"id":1,"v":"a"},"before":null}"""))
      .map { case (off, tsMs, json) =>
        (Array.empty[Byte], json.getBytes("UTF-8"), "topic", 0, off,
          new java.sql.Timestamp(tsMs), 0) }
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val env = ChangeFeed.fromKafkaFrame(rows, valueSchema, Seq("id"))
    val r = env.select(col("id"), col(CdcEnvelope.OpCol), col(CdcEnvelope.PosCol),
        col(CdcEnvelope.LoadTsCol))
      .as[(Long, String, Long, Long)].head()
    assert(r === ((1L, "u", 7L, 1000L * 1000L)))
  }

  test("Kafka frame drives the streaming merge end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.cdc.{CdcTableConfig, TypedProjection}
    import graft.streaming.CdcStream
    implicit val sq = spark.sqlContext
    // (key, value, topic, partition, offset, timestamp, timestampType)
    type KRow = (Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)
    def kRec(offset: Long, tsMs: Long, json: String): KRow =
      (Array.empty[Byte], json.getBytes("UTF-8"), "topic", 0, offset,
        new java.sql.Timestamp(tsMs), 0)

    val cfg = CdcTableConfig(
      cdcTable = "kafka_cdc", sourcePath = "kafka", targetDb = "graft",
      targetTable = "t", targetPath = Files.createTempDirectory("graft-ktgt").toString,
      pk = Seq("id"),
      fieldSpecs = Seq(TypedProjection.FieldSpec("v", TypedProjection.Cast(StringType))))

    val mem = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    val frame = mem.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val env = ChangeFeed.fromKafkaFrame(frame, valueSchema, Seq("id"))
    val ckpt = Files.createTempDirectory("graft-kckpt").toString
    val q = CdcStream.startMergeToTarget(env, cfg, ckpt)
    try {
      mem.addData(
        kRec(1, 1000, """{"op":"c","ts_ms":1000,"source":{"ts_ms":1000},"after":{"id":1,"v":"a"},"before":null}"""),
        kRec(2, 1000, """{"op":"c","ts_ms":1000,"source":{"ts_ms":1000},"after":{"id":2,"v":"x"},"before":null}"""))
      q.processAllAvailable()
      mem.addData(
        kRec(3, 2000, """{"op":"u","ts_ms":2000,"source":{"ts_ms":2000},"after":{"id":1,"v":"b"},"before":{"id":1,"v":"a"}}"""),
        kRec(4, 3000, """{"op":"d","ts_ms":3000,"source":{"ts_ms":3000},"after":null,"before":{"id":2,"v":"x"}}"""))
      q.processAllAvailable()
    } finally q.stop()

    val snap = graft.cdc.CdcPipeline.readSnapshot(spark, cfg.targetPath).get
      .select("id", "v").as[(Long, String)].collect().sorted.toSeq
    assert(snap === Seq((1L, "b")), "id 1 at latest value, id 2 deleted")
  }

  test("Maxwell JSON → envelope: full-row deletes, seconds→µs, position parse, ddl drop") {
    val maxwell = Seq(
      """{"database":"db","table":"t","type":"insert","ts":1000,"xid":11,"position":"bin.000006:800911","data":{"id":1,"v":"a"}}""",
      """{"database":"db","table":"t","type":"update","ts":2000,"xid":12,"position":"bin.000006:800950","data":{"id":1,"v":"b"},"old":{"v":"a"}}""",
      """{"database":"db","table":"t","type":"bootstrap-insert","ts":500,"xid":null,"position":null,"data":{"id":3,"v":"s"}}""",
      """{"database":"db","table":"t","type":"insert","ts":1000,"xid":13,"position":"bin.000006:801000","data":{"id":2,"v":"x"}}""",
      """{"database":"db","table":"t","type":"delete","ts":3000,"xid":14,"position":"bin.000006:801100","data":{"id":2,"v":"x"}}""",
      """{"database":"db","table":"t","type":"table-create","ts":4000,"sql":"CREATE TABLE t2 (...)"}"""
    ).toDF("j")
    val env = ChangeFeed.fromMaxwellJson(maxwell, "j", valueSchema, Seq("id"))
    assert(env.count() === 5, "ddl record must drop")
    // position: binlog offset where present, xid fallback absent both → 0
    val pos = env.select("id", CdcEnvelope.PosCol).as[(Long, Long)].collect()
    assert(pos.contains((1L, 800911L)) && pos.contains((3L, 0L)))
    // seconds → µs
    assert(env.filter(col("id") === 1L && col(CdcEnvelope.OpCol) === "u")
      .agg(max(CdcEnvelope.TsCol)).as[Long].head() === 2000000000L)
    val snap = SnapshotMerge.fromHistory(env, Seq("id"),
      Seq("id", CdcEnvelope.DataCol))
    val got = snap.select(col("id"),
        get_json_object(col(CdcEnvelope.DataCol), "$.v").as("v"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, "b"), (3L, "s")), "delete applied, latest wins")
  }

  test("Canal JSON → envelope: multi-row batches fan out in order, DELETE rows, ddl drop") {
    val canal = Seq(
      // one INSERT statement affecting two rows — one canal record
      """{"database":"db","table":"t","type":"INSERT","isDdl":false,"id":7,"es":1000,"ts":1001,"data":[{"id":1,"v":"a"},{"id":2,"v":"x"}]}""",
      """{"database":"db","table":"t","type":"UPDATE","isDdl":false,"id":8,"es":2000,"ts":2001,"data":[{"id":1,"v":"b"}],"old":[{"v":"a"}]}""",
      """{"database":"db","table":"t","type":"DELETE","isDdl":false,"id":9,"es":3000,"ts":3001,"data":[{"id":2,"v":"x"}]}""",
      """{"database":"db","table":"t","type":"CREATE","isDdl":true,"id":10,"es":4000,"ts":4001,"sql":"ALTER TABLE ..."}"""
    ).toDF("j")
    val env = ChangeFeed.fromCanalJson(canal, "j", valueSchema, Seq("id"))
    assert(env.count() === 4, "2-row insert fans out; ddl drops")
    // batch-id ⊕ index position is monotone and in-batch ordered
    assert(env.filter(col("id") === 1L).select(CdcEnvelope.PosCol)
      .as[Long].collect().toSet === Set(7L * 1048576L + 0L, 8L * 1048576L + 0L))
    assert(env.filter(col("id") === 2L).select(CdcEnvelope.PosCol)
      .as[Long].collect().toSet === Set(7L * 1048576L + 1L, 9L * 1048576L + 0L))
    val snap = SnapshotMerge.fromHistory(env, Seq("id"),
      Seq("id", CdcEnvelope.DataCol))
    val got = snap.select(col("id"),
        get_json_object(col(CdcEnvelope.DataCol), "$.v").as("v"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, "b")), "id 2 deleted by the DELETE record")
  }
}
