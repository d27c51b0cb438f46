package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition functions (the
  * Scala analog of Pandas UDFs over mapInPandas).
  *
  * The actual media decoding is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces deterministic fake media metadata from
  * the bytes. The Spark-side plumbing — binary schema, partition-batched
  * processing, feature extraction signature, downstream joins — is real and
  * tested; swap `decodeStub` for a JNI/javacpp decoder in production.
  *
  * Scale notes: binary payloads stay columnar in parquet; feature extraction
  * is a narrow mapPartitions (no shuffle); never collect payloads to the
  * driver.
  */
object Multimodal {

  /** Fake media metadata a real decoder would produce. */
  case class MediaMeta(width: Int, height: Int, nChannels: Int, durationMs: Long)

  /** STUB decoder: deterministic function of the payload bytes only.
    * A real implementation would parse image headers / decode frames. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(
      width = 16 + (n % 64),
      height = 16 + ((n / 64) % 64),
      nChannels = 3,
      durationMs = n.toLong * 10)
  }

  /** Attach an opaque binary payload + media type (here derived from text;
    * in production these are real image/audio bytes). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_type", lit("application/octet-stream"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Batched per-partition feature extraction over the binary column.
    * Narrow transform: each partition is processed independently. */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast(LongType), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val meta = decodeStub(bytes)
        var checksum = 0L
        var i = 0
        while (i < bytes.length) { checksum = (checksum + (bytes(i) & 0xff)) % 997; i += 1 }
        Row(id, bytes.length.toLong,
          if (bytes.length > 0) bytes(0) & 0xff else -1,
          checksum, meta.width, meta.height)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  /** Deterministic fixed-dim fake embedding from payload bytes — the shape
    * of an image-embedding stage without the model. */
  def fakeEmbedding(dim: Int = 8)(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = ((h % 1000).toFloat / 1000.0f)
      j += 1
    }
    out
  }

  /** Frame-sampling plumbing stub: emits every `stride`-th chunk of the
    * payload as a "frame" row (1:N explode, the real shape of video
    * frame extraction). */
  def sampleFrames(df: DataFrame, idCol: String = "doc_id", stride: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rows = df.select(col(idCol).cast(LongType), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        bytes.grouped(stride).zipWithIndex.map { case (chunk, i) => Row(id, i, chunk) }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
