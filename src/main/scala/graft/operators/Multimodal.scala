package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * Image decode is REAL for JDK-native formats (see
  * [[decodeImageMetaJvm]]: PNG/JPEG/BMP/GIF via javax.imageio), and
  * audio/video container metadata is REAL for WAV/RIFF and
  * MP4/QuickTime (see [[decodeAvHeader]]: pure-JVM header parsing, no
  * codecs needed). The container ships no media codecs, so only
  * formats that require one (mp3 frame scan, matroska EBML, ...) stay
  * on the clearly-marked DETERMINISTIC STUB (features derived from the
  * bytes' md5) — while the Spark-side plumbing is real either way:
  * schema, batch-friendly mapPartitions signature, partitioning notes,
  * and the binaryFile reader path all match what a production decoder
  * (JNI/codec per executor) would plug into.
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end;
  * `spark.sql.files.maxPartitionBytes` bounds scan partitions, and the
  * decode stage is a narrow mapPartitions so a real decoder amortizes
  * per-partition init (model load, codec contexts) exactly where
  * Python's mapInPandas would.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true), // image|audio|video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Read a directory of binary files as media rows (images etc.). */
  def readBinaryDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        col("content").as("payload"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("media_type"),
        lit(null).cast(mediaSchema("meta").dataType).as("meta"))

  /** STUB decode: derives fake-but-deterministic image metadata from the
    * payload hash. A real build replaces the expression body with a
    * codec call (custom Expression or mapPartitions over javax.imageio
    * etc.); the schema and call sites stay identical.
    */
  def decodeImageMeta(payload: Column): Column = {
    val h = md5(payload)
    struct(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % 3840 + 1).as("width"),
      (conv(substring(h, 5, 4), 16, 10).cast("int") % 2160 + 1).as("height"),
      lit(null).cast("long").as("duration_ms"),
      lit("stub").as("codec"))
  }

  /** STUB feature extraction: 8 pseudo-features per payload from md5
    * nibbles, normalized to [0,1). Shape matches a real embedding UDF:
    * binary in, array<double> out, batched per partition.
    */
  def extractFeatures(payload: Column): Column = {
    val h = md5(payload)
    val feats = (0 until 8).map { i =>
      (conv(substring(h, i * 4 + 1, 4), 16, 10).cast("double") / 65536.0)
    }
    array(feats: _*)
  }

  /** Frame sampling plumbing for video-like payloads: emit `n` (offset,
    * chunk) rows per payload — the distributed shape of per-frame
    * extraction (explode then process narrowly, never collect).
    */
  def sampleChunks(df: DataFrame, payload: Column, n: Int, chunkBytes: Int): DataFrame = {
    val total = length(payload) // bytes for binary input
    val idx = sequence(lit(0), lit(n - 1))
    df.withColumn("_chunk", explode(transform(idx, i => {
        val offset = (total * i / n) + 1
        struct(i.as("chunk_no"), payload.substr(offset, lit(chunkBytes)).as("chunk"))
      })))
      .withColumn("chunk_no", col("_chunk.chunk_no"))
      .withColumn("chunk", col("_chunk.chunk"))
      .drop("_chunk")
  }

  /** The real-decoder escape hatch: partition-batched transform where a
    * native decoder would live. Kept generic: callers pass a row fn.
    * (Used by tests with the stub; documents the mapInPandas-equivalent
    * Scala shape.)
    */
  def mapDecode(df: DataFrame, out: StructType)(fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.mapPartitions(fn)(enc)
  }

  /** REAL image decode for the formats the JDK ships codecs for
    * (PNG/JPEG/BMP/GIF/WBMP via javax.imageio — no external libs).
    * Header-only: width/height come from the format reader without
    * decoding pixel data, so cost per image is microseconds regardless
    * of payload size. Runs through [[mapDecode]] (narrow, partition-
    * batched); payloads ImageIO can't identify get a null meta —
    * audio/video stay with the labeled stub path.
    */
  def decodeImageMetaJvm(df: DataFrame,
      payloadCol: String = "payload", metaCol: String = "meta"): DataFrame =
    decodeMetaJvm(df, payloadCol, metaCol)(decodeImageHeader)

  /** REAL combined media decode: image headers via javax.imageio, then
    * audio/video container headers via [[decodeAvHeader]] (WAV/RIFF and
    * MP4/QuickTime — pure-JVM byte parsing, no codecs needed). Payloads
    * neither probe recognizes get a null meta; only codec-requiring
    * formats (mp3 frame scan, matroska/webm EBML, ...) remain outside
    * this real path.
    */
  def decodeMediaMetaJvm(df: DataFrame,
      payloadCol: String = "payload", metaCol: String = "meta"): DataFrame =
    decodeMetaJvm(df, payloadCol, metaCol)(b =>
      decodeImageHeader(b).orElse(decodeAvHeader(b)))

  private def decodeMetaJvm(df: DataFrame, payloadCol: String, metaCol: String)(
      probe: Array[Byte] => Option[Row]): DataFrame = {
    val schema = StructType(df.schema.map {
      case f if f.name == metaCol => f.copy(dataType = mediaSchema("meta").dataType)
      case f => f
    })
    val payloadIdx = schema.fieldIndex(payloadCol)
    val metaIdx = schema.fieldIndex(metaCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val meta = probe(r.getAs[Array[Byte]](payloadIdx))
      Row.fromSeq(r.toSeq.updated(metaIdx, meta.orNull))
    })
  }

  /** Header probe for one payload: (width, height, null duration,
    * format name) via the matching ImageIO reader; None when no
    * installed reader recognizes the bytes.
    */
  def decodeImageHeader(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null) None
    else {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          try {
            rd.setInput(in)
            Some(Row(rd.getWidth(0), rd.getHeight(0), null,
              rd.getFormatName.toLowerCase))
          } catch {
            // readers throw RuntimeExceptions (not just IOException) on
            // truncated/corrupt headers whose magic bytes still matched;
            // one bad crawled payload must not abort the whole job
            case scala.util.control.NonFatal(_) => None
          } finally rd.dispose()
        }
      } finally in.close()
    }
  }

  /** REAL audio/video container header probe — pure-JVM byte parsing,
    * duration without decoding a single sample/frame:
    *
    *  - WAV/RIFF ("RIFF"+"WAVE" magic): walk the chunk list; duration
    *    = data-chunk bytes / fmt-chunk byte rate. Exact for PCM and
    *    any constant-byte-rate codec (the byte rate field is the
    *    container's own average-bytes-per-second declaration).
    *  - MP4/QuickTime (top-level `moov` box, usually after `ftyp`):
    *    duration/timescale from the `mvhd` movie header (v0 32-bit and
    *    v1 64-bit layouts). Width/height live per-track (`tkhd`), so
    *    they stay null here.
    *
    * Returns meta Row(width=null, height=null, duration_ms, codec) or
    * None for unrecognized/corrupt bytes — a crawled payload with a
    * matching magic but a truncated body must degrade to null meta,
    * never abort the job.
    */
  def decodeAvHeader(bytes: Array[Byte]): Option[Row] =
    if (bytes == null) None
    else
      try decodeWav(bytes).orElse(decodeMp4(bytes))
      catch { case scala.util.control.NonFatal(_) => None }

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | (b(i + 1) & 0xffL) << 8 | (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24

  private def u32be(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) << 24 | (b(i + 1) & 0xffL) << 16 | (b(i + 2) & 0xffL) << 8 |
      (b(i + 3) & 0xffL)

  private def u64be(b: Array[Byte], i: Int): Long =
    u32be(b, i) << 32 | u32be(b, i + 4)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def decodeWav(b: Array[Byte]): Option[Row] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12L
    var byteRate = 0L
    var dataBytes = -1L
    while (off + 8 <= b.length && (byteRate == 0 || dataBytes < 0)) {
      val id = tag(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      val body = off + 8
      if (id == "fmt " && size >= 16 && body + 12 + 4 <= b.length)
        byteRate = u32le(b, body.toInt + 8)
      if (id == "data") dataBytes = size
      off = body + size + (size & 1) // chunks are word-aligned
    }
    if (byteRate <= 0 || dataBytes < 0) None
    else Some(Row(null, null, dataBytes * 1000L / byteRate, "wav"))
  }

  private def decodeMp4(b: Array[Byte]): Option[Row] = {
    // top-level box walk: a real MP4 leads with ftyp, but bare
    // QuickTime-style files may lead with moov directly — accept any
    // well-formed box list that contains a moov
    def boxes(lo: Long, hi: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var off = lo
        def hasNext: Boolean = off + 8 <= hi
        def next(): (String, Long, Long) = {
          val t = tag(b, off.toInt + 4)
          val size0 = u32be(b, off.toInt)
          val (hdr, size) =
            if (size0 == 1 && off + 16 <= hi) (16L, u64be(b, off.toInt + 8))
            else if (size0 == 0) (8L, hi - off) // box extends to EOF
            else (8L, size0)
          val r = (t, off + hdr, math.min(off + math.max(size, hdr), hi))
          off += math.max(size, hdr) // malformed size<hdr must still advance
          r
        }
      }
    if (b.length < 8) return None
    val top = boxes(0, b.length.toLong).take(64).toSeq
    // reject non-MP4 byte streams that happen to survive the walk: the
    // first box must be a known top-level type
    val known = Set("ftyp", "moov", "mdat", "free", "skip", "wide", "pdin", "moof")
    if (top.isEmpty || !known.contains(top.head._1)) return None
    top.collectFirst { case ("moov", s, e) => (s, e) }.flatMap { case (s, e) =>
      boxes(s, e).take(64).collectFirst { case ("mvhd", ms, me) => (ms, me) }
        .flatMap { case (ms, _) =>
          val v = b(ms.toInt) & 0xff
          val (timescale, duration) =
            if (v == 1) (u32be(b, ms.toInt + 20), u64be(b, ms.toInt + 24))
            else (u32be(b, ms.toInt + 12), u32be(b, ms.toInt + 16))
          if (timescale <= 0) None
          else Some(Row(null, null, duration * 1000L / timescale, "mp4"))
        }
    }
  }
}
