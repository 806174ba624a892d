package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 C12): media as opaque
  * `binary` columns + typed metadata, batch-shaped per-partition
  * feature extraction.
  *
  * The decode step is STUBBED (this container has no image/audio
  * libs): `decodeStub` derives a deterministic fake feature vector
  * from the bytes. Everything around it is real — the schema
  * contract, the mapPartitions batch boundary (where a JVM codec or
  * an Arrow hand-off to a Python worker would sit), and the
  * partition sizing: media blobs make rows huge, so the operator
  * repartitions by a size budget, not a row count, before the
  * decode pass — at 100 TB that's the difference between balanced
  * decode tasks and one task OOMing on a partition of 4K videos.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Wrap any table into the media shape: `bytes` = UTF-8 of a text
    * column (a deterministic stand-in for real image/audio payloads).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/stub").as("media_type"),
      col(payloadCol).cast("binary").as("bytes"),
      length(col(payloadCol)).as("width"),
      lit(1).as("height"))

  /** STUB decode: ??? in a real deployment (libjpeg/ffmpeg via JNI,
    * or Arrow → Python worker). Deterministic fake: feature j =
    * mean of bytes with index ≡ j (mod dim), scaled to [0,1).
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val j = i % dim
      sums(j) += bytes(i) & 0xff
      counts(j) += 1
      i += 1
    }
    Array.tabulate(dim)(j => if (counts(j) == 0) 0f else (sums(j).toFloat / counts(j)) / 256f)
  }

  /** Per-partition batched feature extraction. `targetPartitionBytes`
    * re-splits by payload volume first so decode tasks are balanced
    * regardless of blob-size skew.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8,
      targetPartitionBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val spark = media.sparkSession
    val totalBytes = media.agg(sum(length(col("bytes")))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    val rdd = media.select("media_id", "bytes").repartition(parts)
      .rdd.mapPartitions { rows =>
        // batch boundary: one iterator = one decode batch (Arrow
        // RecordBatch in the Python-worker deployment)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          Row(r.getLong(0), bytes.length.toLong, decodeStub(bytes, dim).toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
