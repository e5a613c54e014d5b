package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The actual media decoding is STUBBED (no image/audio libraries in
  * this environment — see `decodeBatch`): the stub is deterministic so
  * the pipeline is testable end-to-end. Everything around the stub —
  * schema, batch iteration shape, partitioning, metadata propagation —
  * is the real production plumbing: swap `decodeBatch` for a JNI/FFI
  * decoder and the pipeline is unchanged.
  *
  * Batch shape: `mapPartitions` over row iterators, processing in
  * fixed-size chunks (the JVM analog of Arrow-batch UDFs) so a real
  * decoder can amortize per-batch setup (model load, pinned buffers).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),      // image | audio | video
      StructField("format", StringType),    // e.g. jpeg / wav / mp4
      StructField("n_bytes", LongType))))))

  /** Pack a text column as a fake media payload (UTF-8 bytes) with
    * metadata — gives the local corpus a binary column to drive the
    * pipeline with. In production this is the ingest step reading real
    * blobs.
    */
  def pack(df: DataFrame, idCol: String, textCol: String,
           kind: String = "image", format: String = "jpeg"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit(kind).as("kind"), lit(format).as("format"),
        octet_length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("histogram", ArrayType(LongType)), // 16-bin byte histogram
    StructField("width", IntegerType),             // STUB: derived, not decoded
    StructField("height", IntegerType)))

  /** STUB decoder: where a real implementation would decode the payload
    * (libjpeg / ffmpeg behind JNI). The fake is deterministic — byte
    * histogram + checksum + fake dimensions from the payload length —
    * so downstream operators and tests exercise real data flow.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
    batch.map { case (id, bytes) =>
      val b = if (bytes == null) Array.empty[Byte] else bytes
      val hist = new Array[Long](16)
      var checksum = 0L
      var i = 0
      while (i < b.length) {
        val u = b(i) & 0xFF
        hist(u / 16) += 1
        checksum = (checksum * 31 + u) % 2147483647L
        i += 1
      }
      // ??? real decode goes here; fake dims keep the schema honest
      val width = math.max(1, math.sqrt(b.length.toDouble).toInt)
      val height = if (width == 0) 0 else math.max(1, b.length / math.max(width, 1))
      Row(id, b.length.toLong, checksum, hist.toSeq, width, height)
    }

  /** Feature extraction over the media table: partition-batched map with
    * a fixed batch size. No shuffle — runs wherever the payloads
    * already live (at 100 TB, moving payloads is the cost to avoid).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        decodeBatch(chunk.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling for video-like payloads: slice the payload into
    * fixed-size pseudo-frames and keep every `everyN`-th — the Spark
    * shape (explode of per-row frame lists, frame index metadata) is
    * identical to real video frame extraction.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, everyN: Int = 4): DataFrame =
    media.select(col("media_id"),
        posexplode(split_binaryFrames(col("payload"), frameBytes)))
      .toDF("media_id", "frame_idx", "frame")
      .filter(pmod(col("frame_idx"), lit(everyN)) === 0)

  /** Byte-range frame splitter as an expression (substr on binary). */
  private def split_binaryFrames(payload: org.apache.spark.sql.Column, frameBytes: Int) =
    transform(
      sequence(lit(0),
        greatest(((octet_length(payload) - 1) / frameBytes).cast(IntegerType), lit(0))),
      i => substring(payload, (i * frameBytes + 1).cast(IntegerType), lit(frameBytes)))
}
