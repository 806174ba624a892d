package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.CdcEnvelope
import graft.functions.longDiv

/** Change-feed sources → the canonical CdcEnvelope shape.
  *
  * The reference consumes pre-landed CDC tables whose `data` JSON
  * carries Debezium-style metadata (`__op`, `__ts_ns`,
  * `__source_pos`; merge.sql:307–349). This module builds the same
  * envelope from the formats a Spark deployment actually ingests:
  *
  *  - raw Debezium JSON lines (Kafka topic dumps / file feeds);
  *  - the flattened `data`-payload form the reference lands;
  *  - a streaming file source over either (readStream, so the
  *    CdcStream pipeline consumes it directly).
  *
  * All parsing is `from_json` with explicit schemas — Catalyst
  * prunes unreferenced payload fields and the JSON parser is
  * codegen'd; no driver-side parsing anywhere.
  */
object ChangeFeed {

  /** Debezium change-record schema, payload typed by `valueSchema`. */
  def debeziumSchema(valueSchema: StructType): StructType = StructType(Seq(
    StructField("before", valueSchema, nullable = true),
    StructField("after", valueSchema, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true),
    StructField("source", StructType(Seq(
      StructField("pos", LongType, nullable = true),
      StructField("ts_ms", LongType, nullable = true))), nullable = true)))

  /** Debezium JSON → envelope. Op mapping c/u/r → 'u', d → 'd'
    * (exactly the reference's `!= 'd'` / `= 'd'` split); the payload
    * row is `after` for upserts and `before` for deletes (a delete's
    * `after` is null); event time = source.ts_ms (fallback ts_ms),
    * position = source.pos. `loadTsUs` supplies the window column —
    * defaults to the event time when the feed has no landing
    * timestamp (a Kafka frame passes the broker timestamp, the
    * reference's bq_load_ts analogue).
    */
  def fromDebeziumJson(raw: DataFrame, jsonCol: String, valueSchema: StructType,
      pk: Seq[String], loadTsUs: Option[Column] = None,
      posFallback: Option[Column] = None): DataFrame = {
    val rec = from_json(col(jsonCol), debeziumSchema(valueSchema))
    val isDelete = rec.getField("op") === lit("d")
    val payload = when(isDelete, rec.getField("before")).otherwise(rec.getField("after"))
    val srcTsMs = coalesce(rec.getField("source").getField("ts_ms"), rec.getField("ts_ms"))
    raw.select(
      pk.map(k => payload.getField(k).as(k)) ++ Seq(
        when(isDelete, lit(CdcEnvelope.Delete)).otherwise(lit(CdcEnvelope.Upsert))
          .as(CdcEnvelope.OpCol),
        (srcTsMs * lit(1000L)).as(CdcEnvelope.TsCol),
        coalesce(rec.getField("source").getField("pos"),
          posFallback.getOrElse(lit(0L))).as(CdcEnvelope.PosCol),
        loadTsUs.getOrElse(srcTsMs * lit(1000L)).as(CdcEnvelope.LoadTsCol),
        to_json(payload).as(CdcEnvelope.DataCol)): _*)
  }

  /** A Kafka source frame (the spark-sql-kafka schema: `key` binary,
    * `value` binary, `topic`, `partition`, `offset`, `timestamp`,
    * ...) of Debezium records → envelope. Works identically on
    * `spark.readStream.format("kafka")` and on any frame with the
    * same columns (specs drive it from an in-memory stream), so the
    * pipeline needs no code change between a file feed and a live
    * topic. Event position falls back to the Kafka offset when the
    * record has no source.pos (both are monotone per key within a
    * partition — the Debezium key-hash partitioning contract); the
    * window column is the broker ingestion `timestamp` (µs), playing
    * the reference's bq_load_ts role (merge.sql:111–115).
    */
  def fromKafkaFrame(kafka: DataFrame, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromDebeziumJson(
      kafka.withColumn("_graft_value", col("value").cast("string")),
      "_graft_value", valueSchema, pk,
      loadTsUs = Some(unix_micros(col("timestamp"))),
      posFallback = Some(col("offset")))

  /** JSON-lines file feed of Debezium records → envelope (batch). */
  def debeziumJsonLines(spark: SparkSession, path: String, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromDebeziumJson(spark.read.text(path), "value", valueSchema, pk)

  /** Streaming variant: a file-source stream of Debezium JSON lines,
    * ready for CdcStream.startMergeToTarget.
    */
  def debeziumJsonLinesStream(spark: SparkSession, path: String, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromDebeziumJson(spark.readStream.text(path), "value", valueSchema, pk)

  /** The reference's LANDED CDC-table shape (merge.sql:307–349): each
    * row is a `data` JSON string that itself carries the Debezium
    * metadata — `__op` (c/u/r/d), `__ts_ns`, `__source_pos` — among
    * the source columns, plus an envelope-level load-timestamp column
    * (`bq_load_ts`/`mysql_load_ts`) used for windowing. One from_json
    * parse extracts pk + metadata; the payload string rides through
    * for TypedProjection, so the scan reads exactly two columns.
    *
    * `loadTsIsMicros`: the landed column is epoch-µs (bigint); a
    * timestamp-typed landing would cast upstream.
    */
  def landedTable(df: DataFrame, dataCol: String, loadTsCol: String,
      pk: Seq[String]): DataFrame = {
    val metaFields = Seq("__op", "__ts_ns", "__source_pos")
    val schema = StructType((pk ++ metaFields).map(StructField(_, StringType)))
    // Parse once; separate projection so CollapseProject keeps it single.
    val parsed = df.withColumn("_graft_landed", from_json(col(dataCol), schema))
    val rec = col("_graft_landed")
    parsed.select(
      pk.map(k => rec.getField(k).cast("long").as(k)) ++ Seq(
        when(rec.getField("__op") === lit("d"), lit(CdcEnvelope.Delete))
          .otherwise(lit(CdcEnvelope.Upsert)).as(CdcEnvelope.OpCol),
        expr("(CAST(_graft_landed.__ts_ns AS BIGINT) - pmod(CAST(_graft_landed.__ts_ns AS BIGINT), 1000)) div 1000")
          .as(CdcEnvelope.TsCol),
        rec.getField("__source_pos").cast("long").as(CdcEnvelope.PosCol),
        col(loadTsCol).cast("long").as(CdcEnvelope.LoadTsCol),
        col(dataCol).as(CdcEnvelope.DataCol)): _*)
  }

  /** JSON-lines file feeds of Maxwell / Canal records, batch and
    * streaming (r9 verdict #7 — the same file-source drive the
    * Debezium dialect has, so all three dialects run the identical
    * kill+resume e2e through `CdcStream.startMergeToTarget`).
    */
  def maxwellJsonLines(spark: SparkSession, path: String, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromMaxwellJson(spark.read.text(path), "value", valueSchema, pk)

  def maxwellJsonLinesStream(spark: SparkSession, path: String, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromMaxwellJson(spark.readStream.text(path), "value", valueSchema, pk)

  def canalJsonLines(spark: SparkSession, path: String, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromCanalJson(spark.read.text(path), "value", valueSchema, pk)

  def canalJsonLinesStream(spark: SparkSession, path: String, valueSchema: StructType,
      pk: Seq[String]): DataFrame =
    fromCanalJson(spark.readStream.text(path), "value", valueSchema, pk)

  /** Maxwell change-record schema (Zendesk's MySQL binlog format —
    * one JSON object per ROW event), payload typed by `valueSchema`.
    */
  def maxwellSchema(valueSchema: StructType): StructType = StructType(Seq(
    StructField("database", StringType, nullable = true),
    StructField("table", StringType, nullable = true),
    StructField("type", StringType, nullable = true),
    StructField("ts", LongType, nullable = true), // epoch SECONDS
    StructField("xid", LongType, nullable = true),
    StructField("position", StringType, nullable = true), // "file:offset"
    StructField("data", valueSchema, nullable = true),
    StructField("old", valueSchema, nullable = true)))

  /** Maxwell JSON → envelope (A15's third format): `type`
    * insert/update/bootstrap-insert → 'u', delete → 'd' (a Maxwell
    * DELETE carries the FULL deleted row in `data`, unlike Debezium's
    * before/after split — no branch needed); event time is `ts`
    * epoch-SECONDS (×1e6 to the envelope µs); position = the binlog
    * offset parsed from "file:offset" with the transaction id as
    * fallback. DDL / heartbeat records (no `data`, or a type outside
    * the row-event set) are dropped — they carry no row to merge.
    */
  def fromMaxwellJson(raw: DataFrame, jsonCol: String, valueSchema: StructType,
      pk: Seq[String], loadTsUs: Option[Column] = None): DataFrame = {
    val rec = from_json(col(jsonCol), maxwellSchema(valueSchema))
    val rowTypes = Seq("insert", "update", "delete", "bootstrap-insert")
    val payload = rec.getField("data")
    val tsUs = rec.getField("ts") * lit(1000000L)
    raw
      .where(rec.getField("type").isin(rowTypes: _*) && payload.isNotNull)
      .select(
        pk.map(k => payload.getField(k).as(k)) ++ Seq(
          when(rec.getField("type") === lit("delete"), lit(CdcEnvelope.Delete))
            .otherwise(lit(CdcEnvelope.Upsert)).as(CdcEnvelope.OpCol),
          tsUs.as(CdcEnvelope.TsCol),
          coalesce(
            substring_index(rec.getField("position"), ":", -1).cast("long"),
            rec.getField("xid"), lit(0L)).as(CdcEnvelope.PosCol),
          loadTsUs.getOrElse(tsUs).as(CdcEnvelope.LoadTsCol),
          to_json(payload).as(CdcEnvelope.DataCol)): _*)
  }

  /** Canal change-record schema (Alibaba's canal-json, the flat form
    * Flink CDC consumes): one record per STATEMENT, `data` an ARRAY
    * of affected rows.
    */
  def canalSchema(valueSchema: StructType): StructType = StructType(Seq(
    StructField("database", StringType, nullable = true),
    StructField("table", StringType, nullable = true),
    StructField("type", StringType, nullable = true), // INSERT/UPDATE/DELETE
    StructField("isDdl", BooleanType, nullable = true),
    StructField("id", LongType, nullable = true), // canal batch id
    StructField("es", LongType, nullable = true), // event time MS
    StructField("ts", LongType, nullable = true), // processing time MS
    StructField("data", ArrayType(valueSchema), nullable = true),
    StructField("old", ArrayType(valueSchema), nullable = true)))

  /** Canal JSON → envelope (A15's fourth format): each record fans
    * out via posexplode of its row ARRAY (a multi-row UPDATE is one
    * Canal record, N envelope rows); DELETE rows carry the full row
    * in `data` like Maxwell. Event time `es` (ms → µs); position =
    * batch id ⊕ in-batch index (id·2²⁰ + idx — monotone across and
    * within batches, the total tiebreak compaction needs); DDL
    * records (`isDdl`) drop. The explode is codegen'd Generate on
    * the parse projection — no shuffle, rows ∝ affected rows.
    */
  def fromCanalJson(raw: DataFrame, jsonCol: String, valueSchema: StructType,
      pk: Seq[String], loadTsUs: Option[Column] = None): DataFrame = {
    val rec = from_json(col(jsonCol), canalSchema(valueSchema))
    val parsed = raw
      .where(!coalesce(rec.getField("isDdl"), lit(false)) &&
        rec.getField("data").isNotNull)
      .select(rec.as("_graft_rec"))
      .select(col("_graft_rec"),
        posexplode(col("_graft_rec.data")).as(Seq("_graft_idx", "_graft_row")))
    val r = col("_graft_rec")
    val tsUs = r.getField("es") * lit(1000L)
    parsed.select(
      pk.map(k => col("_graft_row").getField(k).as(k)) ++ Seq(
        when(r.getField("type") === lit("DELETE"), lit(CdcEnvelope.Delete))
          .otherwise(lit(CdcEnvelope.Upsert)).as(CdcEnvelope.OpCol),
        tsUs.as(CdcEnvelope.TsCol),
        (coalesce(r.getField("id"), lit(0L)) * lit(1048576L) +
          col("_graft_idx")).as(CdcEnvelope.PosCol),
        loadTsUs.getOrElse(tsUs).as(CdcEnvelope.LoadTsCol),
        to_json(col("_graft_row")).as(CdcEnvelope.DataCol)): _*)
  }

  /** The driver's events parquet as a change feed (SURVEY.md §4).
    * `tsToNanos` absorbs the dataset's ts-column generation (nanos
    * read as BIGINT vs TIMESTAMP micros) before the envelope mapping.
    */
  def eventsParquet(spark: SparkSession, dir: String): DataFrame =
    CdcEnvelope.fromEvents(graft.Tables.tsToNanos(
      spark.read.parquet(s"$dir/events.parquet")))
}
