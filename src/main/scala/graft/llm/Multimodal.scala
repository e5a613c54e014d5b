package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * Decoding is a format registry: binary P6 PPM (the zero-dependency
  * public image format — `man ppm`) is decoded for REAL (header parse
  * → width/height/maxval, pixel-byte histogram), and unrecognized
  * formats fall back to byte-level stats with unknown (0×0) dims —
  * where a production deployment registers its libjpeg/ffmpeg FFI
  * decoders. Schema, batch iteration shape, partitioning, and metadata
  * propagation are unchanged by adding a format.
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

  /** Pack a text column as a VALID binary-PPM (P6) payload: dimensions
    * are simple functions of the text's UTF-8 BYTE length (w =
    * bytes%16+1, h = bytes%8+1) and the pixel plane is the text's bytes
    * repeated and sliced to exactly 3·w·h BYTES (binary substring on
    * the encoded form) — so the header-declared pixel count equals the
    * actual payload byte count for ARBITRARY text, not just ASCII, and
    * [[extractFeatures]]' byte-based decoder always sees a well-formed
    * image. Every derivation is a plain expression, so a SQL oracle can
    * reconstruct the payload and re-derive the decoded features; the
    * q40 oracle does this with CHARACTER functions, which coincide with
    * these byte derivations exactly on ASCII corpora (true of the test
    * corpus — stated at the oracle). Empty/null text packs as a single
    * space (1×1 image) to keep the payload well-formed.
    */
  def packPpm(df: DataFrame, idCol: String, textCol: String): DataFrame =
    packPnm(df, idCol, textCol, "P6", "ppm", channels = 3)

  /** PGM (P5) twin of [[packPpm]]: single gray channel, plane of
    * exactly w·h bytes. Second REAL member of the decode registry — a
    * mixed PPM/PGM/unrecognized corpus exercises both decoders plus
    * the fallback in one pipeline (q81).
    */
  def packPgm(df: DataFrame, idCol: String, textCol: String): DataFrame =
    packPnm(df, idCol, textCol, "P5", "pgm", channels = 1)

  private def packPnm(df: DataFrame, idCol: String, textCol: String,
                      magic: String, format: String, channels: Int): DataFrame = {
    val t = when(col(textCol).isNull || length(col(textCol)) === 0, lit(" "))
      .otherwise(col(textCol))
    val bl = octet_length(encode(t, "UTF-8"))
    val w = pmod(bl, lit(16)) + 1
    val h = pmod(bl, lit(8)) + 1
    val npix = w * h * lit(channels)
    // repeating the STRING r times repeats its UTF-8 bytes r times, so
    // r = ceil(npix / byteLen) guarantees ≥ npix bytes before the slice
    val reps = ceil(npix.cast("double") / bl).cast("int")
    val pixels = encode(repeat(t, reps), "UTF-8").substr(lit(1), npix)
    val hdr = encode(concat(
      lit(magic + "\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n")),
      "UTF-8")
    val body = concat(hdr, pixels)
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      body.as("payload"),
      struct(lit("image").as("kind"), lit(format).as("format"),
        octet_length(body).cast(LongType).as("n_bytes")).as("meta"))
  }

  /** Pack a text column as a VALID PCM WAV payload (RIFF container —
    * the zero-dependency public audio format): format parameters are
    * simple functions of the text's UTF-8 BYTE length (sample rate
    * 8/12/16/20 kHz by bytes%4, channels = bytes%2+1, 16-bit PCM,
    * frames = bytes%50+10) and the sample data is the text's bytes
    * cycled to exactly frames·blockAlign bytes. The audio twin of
    * [[packPpm]]: every parameter is re-derivable from LENGTH(text) in
    * SQL (byte length == char length on the ASCII test corpus — same
    * caveat the q40 oracle states), while [[extractAudioFeatures]]
    * derives them by PARSING the binary RIFF header — their equality
    * proves the writer+parser round trip. Bytes are written
    * little-endian JVM-side (mapPartitions): binary int encoding is
    * not expressible as a Column, unlike the ASCII netpbm header.
    * Empty/null text packs as a single space.
    */
  def packWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col(textCol)).rdd.mapPartitions {
      _.map { r =>
        val id = r.getLong(0)
        val t0 = if (r.isNullAt(1) || r.getString(1).isEmpty) " " else r.getString(1)
        val tb = t0.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bl = tb.length
        val sampleRate = 8000 + (bl % 4) * 4000
        val channels = bl % 2 + 1
        val blockAlign = channels * 2 // 16-bit PCM
        val byteRate = sampleRate * blockAlign
        val nFrames = bl % 50 + 10
        val dataBytes = nFrames * blockAlign
        val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
        buf.put("fmt ".getBytes).putInt(16)
          .putShort(1.toShort)                    // PCM
          .putShort(channels.toShort)
          .putInt(sampleRate).putInt(byteRate)
          .putShort(blockAlign.toShort).putShort(16.toShort)
        buf.put("data".getBytes).putInt(dataBytes)
        var i = 0
        while (i < dataBytes) { buf.put(tb(i % bl)); i += 1 }
        val payload = buf.array()
        Row(id, payload, Row("audio", "wav", payload.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Parse a RIFF/WAVE header: walks the chunk list for `fmt ` (PCM
    * parameters) and `data` (sample byte count). Returns (sampleRate,
    * channels, bitsPerSample, dataBytes) or None for anything that is
    * not a well-formed PCM WAV — the registry-fallback contract, like
    * [[parsePnmHeader]].
    */
  private[graft] def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= b.length && s.indices.forall(i => b(off + i) == s.charAt(i))
    def le16(off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    def le32(off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    if (b.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    // the chunk walk runs in Long so a hostile/corrupt 32-bit size can
    // neither wrap `off` negative nor stall the loop — anything
    // malformed falls out of bounds and returns None (the registry-
    // fallback contract)
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes: Option[Long] = None
    while (off + 8 <= b.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val o = off.toInt
      val size = le32(o + 4) // unsigned 32-bit, always ≥ 0 as a Long
      if (ascii(o, "fmt ") && size >= 16 && o + 8 + 16 <= b.length) {
        val audioFormat = le16(o + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le32(o + 12).toInt, le16(o + 10), le16(o + 22)))
      } else if (ascii(o, "data")) {
        dataBytes = Some(math.min(size, (b.length - o - 8).toLong))
      }
      // chunks are word-aligned (odd sizes pad one byte)
      off += 8L + size + (size & 1L)
    }
    for ((sr, ch, bits) <- fmt; db <- dataBytes if sr > 0 && ch > 0 && bits > 0)
      yield (sr, ch, bits, db)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("sample_rate", IntegerType),  // 0 = not a PCM WAV
    StructField("n_channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("duration_ms", LongType)))

  /** Audio metadata extraction — the audio member of the decode
    * registry: PCM WAV payloads are parsed for real (RIFF chunk walk →
    * rate/channels/bits, duration from data size / byte rate);
    * anything else reports zeros, the FFI-decoder slot. Same
    * partition-batched, shuffle-free shape as [[extractFeatures]].
    */
  def extractAudioFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        chunk.map { r =>
          val id = r.getLong(0)
          val b = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          parseWavHeader(b) match {
            case Some((sr, ch, bits, db)) =>
              val byteRate = sr.toLong * ch * (bits / 8)
              val durMs = if (byteRate > 0) db * 1000L / byteRate else 0L
              Row(id, b.length.toLong, sr, ch, bits, durMs)
            case None => Row(id, b.length.toLong, 0, 0, 0, 0L)
          }
        }
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),             // over the full payload
    StructField("histogram", ArrayType(LongType)), // 16-bin byte histogram:
                                                   //   PIXEL bytes for PPM,
                                                   //   all bytes otherwise
    StructField("width", IntegerType),             // decoded; 0 = unknown
    StructField("height", IntegerType)))

  /** Parse a binary netpbm header — P5 (PGM, 1 gray channel) or P6
    * (PPM, 3 RGB channels): magic, then whitespace-separated width,
    * height, maxval — `#` comments allowed between tokens — then
    * EXACTLY one whitespace byte before the raw sample data (the
    * netpbm spec's framing). Returns (channels, width, height, maxval,
    * pixelStart) or None if the payload is neither well-formed P5 nor
    * P6. Adding a magic here is the whole cost of a new registry
    * format: decode, histogram clipping, and metadata flow unchanged.
    */
  private[graft] def parsePnmHeader(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P') return None
    val channels = b(1) match {
      case '6' => 3 // PPM: RGB triples
      case '5' => 1 // PGM: single gray channel
      case _ => return None
    }
    var i = 2
    def skipSpaceAndComments(): Unit = {
      var more = true
      while (more && i < b.length) {
        if (Character.isWhitespace(b(i))) i += 1
        else if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else more = false
      }
    }
    def readInt(): Option[Int] = {
      skipSpaceAndComments()
      val start = i
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      mx <- readInt()
      if w > 0 && h > 0 && mx > 0 && mx < 65536 &&
        i < b.length && Character.isWhitespace(b(i))
    } yield (channels, w, h, mx, i + 1)
  }

  /** Batched decoder. P5 PGM and P6 PPM payloads are decoded for real:
    * dimensions come from the parsed header and the histogram covers
    * only the sample bytes (clipped to the header-declared
    * channels·w·h, tolerating truncated payloads). Other formats get
    * byte-level stats with 0×0 dims — the registry slot for FFI
    * decoders.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
    batch.map { case (id, bytes) =>
      val b = if (bytes == null) Array.empty[Byte] else bytes
      var checksum = 0L
      var i = 0
      while (i < b.length) {
        checksum = (checksum * 31 + (b(i) & 0xFF)) % 2147483647L
        i += 1
      }
      val hist = new Array[Long](16)
      def histogramOf(from: Int, until: Int): Unit = {
        var j = from
        while (j < until) { hist((b(j) & 0xFF) / 16) += 1; j += 1 }
      }
      val (width, height) = parsePnmHeader(b) match {
        case Some((channels, w, h, mx, pixelStart)) =>
          val bytesPerSample = if (mx > 255) 2 else 1 // netpbm 16-bit form
          // declared size, overflow-saturated: w·h each reach
          // Int.MaxValue, so even the Long product of all four factors
          // can wrap negative and zero the histogram (r17 ADVICE). The
          // histogram is capped at the payload anyway, so once the pixel
          // count alone covers b.length the exact product is irrelevant.
          val pixels = w.toLong * h.toLong // ≤ (2³¹)² < Long.MaxValue
          val declared =
            if (pixels >= b.length.toLong) b.length.toLong
            else pixels * channels * bytesPerSample // pixels < 2³¹ ⇒ fits
          histogramOf(pixelStart,
            math.min(b.length.toLong, pixelStart + declared).toInt)
          (w, h)
        case None =>
          histogramOf(0, b.length)
          (0, 0)
      }
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
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, everyN: Int = 4): DataFrame = {
    // fail loudly like every sibling (frameBytes = 0 silently yielded
    // one empty frame per row via ANSI-off null math); an EMPTY payload
    // emits no frames, same as a null one (r17 review)
    require(frameBytes > 0 && everyN > 0, "frameBytes and everyN must be positive")
    media.filter(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .select(col("media_id"),
        posexplode(split_binaryFrames(col("payload"), frameBytes)))
      .toDF("media_id", "frame_idx", "frame")
      .filter(pmod(col("frame_idx"), lit(everyN)) === 0)
  }

  /** Byte-range frame splitter as an expression (substr on binary). */
  private def split_binaryFrames(payload: org.apache.spark.sql.Column, frameBytes: Int) =
    transform(
      sequence(lit(0),
        greatest(((octet_length(payload) - 1) / frameBytes).cast(IntegerType), lit(0))),
      i => substring(payload, (i * frameBytes + 1).cast(IntegerType), lit(frameBytes)))
}
