package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * Image decode is REAL for JDK-native formats (see
  * [[decodeImageMetaJvm]]: PNG/JPEG/BMP/GIF via javax.imageio), and
  * audio/video container metadata is REAL for WAV/RIFF, MP4/QuickTime,
  * Matroska/WebM (EBML walk) and MP3 (frame-header walk) — see
  * [[decodeAvHeader]]: pure-JVM header/table parsing, no codecs
  * needed. Image PIXEL decode is ALSO real — the JDK ships its own
  * PNG/JPEG/BMP/GIF codecs, so [[decodeImageContentJvm]] extracts
  * exact per-channel pixel sums with zero external dependencies —
  * and so is audio SAMPLE decode for PCM WAV: the JDK ships its own
  * WAV reader/writer in `javax.sound.sampled`, so
  * [[audioEnvelopeHash]]/[[synthPcmWav]] run a real encode→decode
  * round-trip with zero external dependencies. Only COMPRESSED audio
  * (MP3/AAC/Vorbis) and video SAMPLE decode (true external-codec
  * territory) stay on the clearly-marked DETERMINISTIC STUB (features
  * derived from the bytes' md5) — while the Spark-side plumbing is
  * real either way:
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

  /** Schema of the REAL pixel-content feature struct: exact integer
    * channel sums so features are deterministic on any executor (no
    * float accumulation order); callers derive means as
    * sum div n_pixels.
    */
  val contentSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  /** REAL image CONTENT decode — full pixel decode via the JDK's own
    * javax.imageio codecs (PNG/JPEG/BMP/GIF/WBMP ship with the JVM —
    * no external libraries), extracting exact per-channel integer
    * sums: the mean-color / brightness features an image-dedup or
    * quality gate runs on. This retires the content-decode stub for
    * every JDK-native image format; only audio/video SAMPLE decode
    * (true codec territory) remains stubbed.
    *
    * Determinism: sums are exact integers over the decoded ARGB
    * raster, so the feature is bit-stable across executors and runs
    * (JPEG pixel values are whatever the JDK decoder produces —
    * deterministic for a fixed JDK, exact for lossless formats).
    * Cost: O(pixels) per payload in a narrow partition-batched pass
    * ([[mapDecode]]) — the shape a per-partition codec context wants.
    * Unrecognized/corrupt payloads yield a null struct, never an
    * aborted job.
    */
  def decodeImageContentJvm(df: DataFrame,
      payloadCol: String = "payload", outCol: String = "content"): DataFrame = {
    val schema = StructType(df.schema.filter(_.name != outCol) :+
      StructField(outCol, contentSchema, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val dropIdx = df.schema.fieldNames.indexOf(outCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val base = if (dropIdx < 0) r.toSeq
        else r.toSeq.patch(dropIdx, Nil, 1)
      Row.fromSeq(base :+ imageContentFeatures(
        r.getAs[Array[Byte]](payloadIdx)).orNull)
    })
  }

  /** Pixel-sum probe for one payload; None when ImageIO has no codec
    * for the bytes (or they are corrupt past the header).
    */
  def imageContentFeatures(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some(Row(w, h, w.toLong * h, sr, sg, sb))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Average-hash (aHash) perceptual image fingerprint over the REAL
    * decoded raster — the image-dedup primitive: decode via the JDK's
    * own codecs, reduce to an 8×8 luma grid by exact integer block
    * sums, bit (cy·8+cx) set iff that cell's mean luma exceeds the
    * global mean. Every comparison is CROSS-MULTIPLIED
    * (cellSum·nPixels > globalSum·cellPixels) so the hash is exact
    * integer arithmetic end to end — no float means, no rounding
    * divergence; near-duplicate images (resizes, small edits) land
    * within small Hamming distance, and pairing them is the simhash
    * machinery verbatim (band the 64 bits, bucket-join, verify).
    * Luma = 299r + 587g + 114b (integer Rec.601 ×1000 — the scale
    * cancels in the cross-multiplied compare).
    *
    * Returns None when ImageIO has no codec for the bytes or the
    * image is empty.
    */
  def imageAHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None else aHashOfImage(img)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def aHashOfImage(img: java.awt.image.BufferedImage): Option[Long] = {
    try {
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val cellSum = new Array[Long](64)
      val cellN = new Array[Long](64)
      var global = 0L
      var y = 0
      while (y < h) {
        val cy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val cx = math.min(7, x * 8 / w)
          val p = img.getRGB(x, y)
          val luma = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
            114L * (p & 0xff)
          val c = cy * 8 + cx
          cellSum(c) += luma; cellN(c) += 1L; global += luma
          x += 1
        }
        y += 1
      }
      val nPix = w.toLong * h
      var hash = 0L
      var c = 0
      while (c < 64) {
        // BigInt compare: cellSum·nPix tops 2^63 past ~6 MP rasters
        // (64 BigInt ops per image — noise next to the decode)
        if (cellN(c) > 0 &&
            BigInt(cellSum(c)) * nPix > BigInt(global) * cellN(c))
          hash |= 1L << c
        c += 1
      }
      Some(hash)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[imageAHash]] over a payload column — adds `(ahash, width,
    * height)` nullable columns via one [[mapDecode]] partition pass
    * (the decode happens once; dimensions ride along for free).
    */
  def decodeImageAHash(df: DataFrame,
      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema :+
      StructField("ahash", LongType, nullable = true) :+
      StructField("width", LongType, nullable = true) :+
      StructField("height", LongType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val bytes = r.getAs[Array[Byte]](payloadIdx)
      // ONE decode serves both the hash and the dimensions
      val decoded: Option[java.awt.image.BufferedImage] =
        if (bytes == null) None
        else try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
      val hash = decoded.flatMap(aHashOfImage)
      Row.fromSeq(r.toSeq :+ hash.map(java.lang.Long.valueOf).orNull :+
        decoded.filter(_ => hash.nonEmpty)
          .map(i => java.lang.Long.valueOf(i.getWidth.toLong)).orNull :+
        decoded.filter(_ => hash.nonEmpty)
          .map(i => java.lang.Long.valueOf(i.getHeight.toLong)).orNull)
    })
  }

  /** Synthesize a REAL grayscale BMP payload from a gray-value array
    * (row-major, values 0–255) via the JDK's own encoder — the
    * battery's oracle-checkable image source: BMP is lossless (the
    * round-trip pin in MultimodalSpec), so the decoded raster equals
    * the input values exactly and an arithmetic oracle can re-derive
    * any pixel-content feature without a codec. One [[mapDecode]]
    * pass; a null/short gray array yields a null payload.
    */
  def synthGrayBmp(df: DataFrame, grayCol: String, w: Int, h: Int,
      outCol: String = "payload"): DataFrame = {
    require(w >= 1 && h >= 1, s"need positive dims, got ${w}x$h")
    val schema = StructType(df.schema :+
      StructField(outCol, BinaryType, nullable = true))
    val grayIdx = df.schema.fieldIndex(grayCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val g = r.getAs[scala.collection.Seq[Long]](grayIdx)
      val payload: Array[Byte] =
        if (g == null || g.length < w * h) null
        else {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < w * h) {
            val v = (g(i) & 0xffL).toInt
            img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "bmp", bos)
          bos.toByteArray
        }
      Row.fromSeq(r.toSeq :+ payload)
    })
  }

  /** Synthesize an array of REAL compressed image frames from an array
    * of gray-value grids (each row-major, values 0–255) — the
    * per-frame analog of [[synthGrayBmp]], feeding
    * [[synthMp4FromBytes]] with genuinely compressed samples for the
    * [[FrameDecoder]] seam. `format` is any lossless ImageIO writer
    * ("png" — deflate-compressed, the default — or "bmp"); lossless
    * matters because the oracle re-derives decoded pixels
    * arithmetically. A null frame array yields null; a null/short
    * grid yields a null frame (which [[synthMp4FromBytes]] then
    * degrades to a null payload).
    */
  def synthGrayFrames(df: DataFrame, graysCol: String, w: Int, h: Int,
      format: String = "png", outCol: String = "_frames"): DataFrame = {
    require(w >= 1 && h >= 1, s"need positive dims, got ${w}x$h")
    val schema = StructType(df.schema :+
      StructField(outCol, ArrayType(BinaryType, containsNull = true),
        nullable = true))
    val gIdx = df.schema.fieldIndex(graysCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val grids = r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](gIdx)
      val frames: scala.collection.Seq[Array[Byte]] =
        if (grids == null) null
        else grids.map { g =>
          if (g == null || g.length < w * h) null
          else {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var i = 0
            while (i < w * h) {
              val v = (g(i) & 0xffL).toInt
              img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
              i += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, format, bos)
            bos.toByteArray
          }
        }
      Row.fromSeq(r.toSeq :+ frames)
    })
  }

  /** REAL image resize — decode via the JDK codecs, scale through the
    * AWT raster pipeline (bilinear), re-encode lossless BMP: the
    * thumbnail/normalize step of a multimodal ingest, fully
    * functional with zero external libraries. Deterministic for a
    * fixed JDK (one interpolation path, no dithering); feed the
    * output to [[imageAHash]] for resize-tolerant dedup or to the
    * content probes for normalized features. Returns None for
    * payloads no codec accepts.
    */
  def resizeImageBytes(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w >= 1 && h >= 1, s"need positive dims, got ${w}x$h")
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "bmp", bos)
      Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[resizeImageBytes]] over a payload column — adds a nullable
    * `resized` binary column via one [[mapDecode]] partition pass.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int,
      payloadCol: String = "payload", outCol: String = "resized"): DataFrame = {
    val schema = StructType(df.schema :+
      StructField(outCol, BinaryType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      Row.fromSeq(r.toSeq :+
        resizeImageBytes(r.getAs[Array[Byte]](payloadIdx), w, h).orNull)
    })
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
    *  - Matroska/WebM (EBML magic 0x1A45DFA3): EBML varint walk to
    *    Segment → Info, duration = Duration (float) × TimestampScale
    *    (ns/tick, default 1e6). Codec tag from the header's DocType.
    *  - MP3 (optional ID3v2, then an MPEG audio frame at offset 0):
    *    frame-by-frame walk using each header's own bitrate/samplerate
    *    tables — no decoding, and VBR streams sum correctly because
    *    every frame contributes its own samples/samplerate. Weakest
    *    magic of the four, so it probes last and demands ≥2
    *    consecutive valid frames before trusting a sync word.
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
        .orElse(decodeMkv(bytes)).orElse(decodeMp3(bytes))
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

  /** ISO-BMFF box iterator over `[lo, hi)`: yields (type, bodyStart,
    * bodyEnd) handling 64-bit (`size==1`) and to-EOF (`size==0`)
    * largesize forms; malformed sizes still advance (never loop).
    * Shared by the mvhd duration probe and the [[mp4SampleTable]]
    * demux walk.
    */
  private def mp4Boxes(b: Array[Byte], lo: Long, hi: Long): Iterator[(String, Long, Long)] =
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

  private def decodeMp4(b: Array[Byte]): Option[Row] = {
    // top-level box walk: a real MP4 leads with ftyp, but bare
    // QuickTime-style files may lead with moov directly — accept any
    // well-formed box list that contains a moov
    def boxes(lo: Long, hi: Long): Iterator[(String, Long, Long)] =
      mp4Boxes(b, lo, hi)
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

  // ---- MP3: frame-header walk (no codec — pure table lookups) -------------

  // bitrate (kbps) by [version-group][layer][index]; index 0 = "free
  // format" and 15 = invalid, both rejected. Version groups: 0 = MPEG1,
  // 1 = MPEG2/2.5 (which share one Layer2/3 table).
  private val mp3Bitrates: Array[Array[Array[Int]]] = {
    val v1l1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    val v1l2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    val v1l3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val v2l1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    val v2l23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    Array(Array(v1l1, v1l2, v1l3), Array(v2l1, v2l23, v2l23))
  }
  private val mp3Rates: Map[Int, Array[Int]] = Map( // by version bits
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** One parsed frame header: (frameBytes, samplesPerFrame, sampleRate),
    * or None if the 4 bytes at `i` are not a valid MPEG audio header.
    */
  private def mp3Frame(b: Array[Byte], i: Int): Option[(Int, Int, Int)] = {
    if (i + 4 > b.length || (b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return None
    val version = (b(i + 1) >> 3) & 3   // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
    val layerBits = (b(i + 1) >> 1) & 3 // 0=reserved 1=L3 2=L2 3=L1
    val brIdx = (b(i + 2) >> 4) & 15
    val srIdx = (b(i + 2) >> 2) & 3
    val padding = (b(i + 2) >> 1) & 1
    if (version == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val layer = 3 - layerBits // 0=L1 1=L2 2=L3
    val vGroup = if (version == 3) 0 else 1
    val bitrate = mp3Bitrates(vGroup)(layer)(brIdx) * 1000
    val rate = mp3Rates(version)(srIdx)
    val samples =
      if (layer == 0) 384
      else if (layer == 1) 1152
      else if (version == 3) 1152 else 576 // L3: halved for MPEG2/2.5
    val len =
      if (layer == 0) (12 * bitrate / rate + padding) * 4
      else samples / 8 * bitrate / rate + padding
    Some((len, samples, rate))
  }

  private def decodeMp3(b: Array[Byte]): Option[Row] = {
    // skip a leading ID3v2 tag: "ID3" + ver(2) + flags(1) + syncsafe size(4)
    var off =
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        10 + ((b(6) & 0x7f) << 21 | (b(7) & 0x7f) << 14 | (b(8) & 0x7f) << 7 | (b(9) & 0x7f))
      else 0
    if (off >= b.length) return None
    // a real stream's first frame sits exactly at off (no sync hunting —
    // that is what keeps arbitrary binary from false-matching)
    var frames = 0
    var micros = 0L
    var ok = true
    while (ok && off + 4 <= b.length) {
      mp3Frame(b, off) match {
        case Some((len, samples, rate)) if len > 4 =>
          frames += 1
          micros += samples * 1000000L / rate
          off += len
        case _ => ok = false
      }
    }
    // demand ≥2 consecutive valid frames AND that the walk consumed the
    // stream (last frame may be truncated; anything else is a false sync)
    if (frames >= 2 && (ok || off + 4 > b.length || frames >= 16))
      Some(Row(null, null, micros / 1000L, "mp3"))
    else None
  }

  // ---- Matroska/WebM: EBML varint walk ------------------------------------

  /** EBML varint at `i`: (value, widthBytes, allOnes). For element IDs
    * the marker bit is kept (IDs are compared with it); for sizes it is
    * stripped by the caller via `mask`.
    */
  private def ebmlVarint(b: Array[Byte], i: Int, keepMarker: Boolean): Option[(Long, Int, Boolean)] = {
    if (i >= b.length) return None
    val first = b(i) & 0xff
    if (first == 0) return None
    val width = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (i + width > b.length) return None
    var v = if (keepMarker) first.toLong else (first & (0xff >>> width)).toLong
    var allOnes = (first & (0xff >>> width)) == (0xff >>> width)
    var j = 1
    while (j < width) {
      val byte = b(i + j) & 0xff
      v = v << 8 | byte
      allOnes &&= byte == 0xff
      j += 1
    }
    Some((v, width, allOnes))
  }

  /** Children of an EBML master element as (id, bodyStart, bodyEnd). */
  private def ebmlChildren(b: Array[Byte], lo: Int, hi: Int): Iterator[(Long, Int, Int)] =
    new Iterator[(Long, Int, Int)] {
      private var off = lo
      private var nxt: Option[(Long, Int, Int)] = advance()
      private def advance(): Option[(Long, Int, Int)] =
        for {
          (id, idW, _) <- ebmlVarint(b, off, keepMarker = true)
          (size, szW, unknown) <- ebmlVarint(b, off + idW, keepMarker = false)
        } yield {
          val body = off + idW + szW
          val end = if (unknown) hi else math.min(body + size, hi).toInt
          (id, body, math.max(end, body))
        }
      def hasNext: Boolean = nxt.isDefined && off < hi
      def next(): (Long, Int, Int) = {
        val r = nxt.get
        off = r._3
        nxt = if (off < hi) advance() else None
        r
      }
    }

  private def ebmlUint(b: Array[Byte], lo: Int, hi: Int): Long = {
    var v = 0L
    var i = lo
    while (i < hi) { v = v << 8 | (b(i) & 0xff); i += 1 }
    v
  }

  private def decodeMkv(b: Array[Byte]): Option[Row] = {
    if (b.length < 4 || u32be(b, 0) != 0x1a45dfa3L) return None
    val top = ebmlChildren(b, 0, b.length).take(16).toSeq
    val docType = top.collectFirst { case (0x1a45dfa3L, s, e) => (s, e) }
      .flatMap { case (s, e) =>
        ebmlChildren(b, s, e).collectFirst { case (0x4282L, ds, de) =>
          new String(b, ds, de - ds, java.nio.charset.StandardCharsets.US_ASCII)
            .takeWhile(_ != 0) // DocType may be zero-padded
        }
      }
    if (docType.isEmpty) return None // EBML but not a media container we know
    top.collectFirst { case (0x18538067L, s, e) => (s, e) }.map { case (s, e) =>
      val info = ebmlChildren(b, s, e).take(64)
        .collectFirst { case (0x1549a966L, is, ie) => (is, ie) }
      val (scaleNs, durTicks) = info match {
        case Some((is, ie)) =>
          var scale = 1000000L // Matroska default: 1ms ticks
          var dur: Option[Double] = None
          ebmlChildren(b, is, ie).take(64).foreach {
            case (0x2ad7b1L, ds, de) => scale = ebmlUint(b, ds, de)
            case (0x4489L, ds, de) if de - ds == 4 =>
              dur = Some(java.lang.Float.intBitsToFloat(u32be(b, ds).toInt).toDouble)
            case (0x4489L, ds, de) if de - ds == 8 =>
              dur = Some(java.lang.Double.longBitsToDouble(u32be(b, ds) << 32 | u32be(b, ds + 4)))
            case _ => ()
          }
          (scale, dur)
        case None => (1000000L, None)
      }
      val durMs = durTicks.map(t => math.round(t * scaleNs / 1e6))
      Row(null, null, durMs.map(Long.box).orNull, docType.get match {
        case "webm" => "webm"
        case _ => "matroska"
      })
    }
  }

  // ---------- REAL audio sample decode (javax.sound.sampled) ----------

  /** Synthesize a REAL PCM WAV payload (8-bit unsigned mono) from a
    * sample array (values 0–255) via the JDK's own audio encoder
    * (`javax.sound.sampled.AudioSystem.write`) — the audio analog of
    * [[synthGrayBmp]]: PCM WAV is lossless (the round-trip pin in
    * MultimodalSpec), so the decoded samples equal the input exactly
    * and an arithmetic oracle can re-derive any sample-content feature
    * without a codec. One [[mapDecode]] pass; a null/empty sample
    * array yields a null payload.
    */
  def synthPcmWav(df: DataFrame, samplesCol: String, sampleRateHz: Int,
      outCol: String = "payload"): DataFrame = {
    require(sampleRateHz >= 1, s"need a positive sample rate, got $sampleRateHz")
    val schema = StructType(df.schema :+
      StructField(outCol, BinaryType, nullable = true))
    val sIdx = df.schema.fieldIndex(samplesCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val s = r.getAs[scala.collection.Seq[Long]](sIdx)
      val payload: Array[Byte] =
        if (s == null || s.isEmpty) null
        else {
          val pcm = new Array[Byte](s.length)
          var i = 0
          while (i < s.length) { pcm(i) = (s(i) & 0xffL).toByte; i += 1 }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            sampleRateHz.toFloat, 8, 1, 1, sampleRateHz.toFloat, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, s.length.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
      Row.fromSeq(r.toSeq :+ payload)
    })
  }

  /** Amplitude-envelope fingerprint over REAL decoded audio samples —
    * the audio-dedup primitive and the [[imageAHash]] analog: decode
    * via the JDK's own WAV codec (`AudioSystem.getAudioInputStream` —
    * no external libs), bucket the samples into 64 equal time blocks,
    * bit b set iff block b's mean level exceeds the global mean.
    * Every compare is CROSS-MULTIPLIED (blockSum·nSamples >
    * globalSum·blockN) in BigInt, so the fingerprint is exact integer
    * arithmetic end to end; re-encodes and small edits land within
    * small Hamming distance, and pairing fingerprints is the simhash
    * banding machinery verbatim.
    *
    * Supports the PCM layouts the JDK decodes natively: 8-bit
    * (unsigned or signed) and 16-bit signed (either endianness), mono.
    * Levels normalize to unsigned (signed +128 / +32768) so the bit
    * pattern is encoding-invariant for the same waveform. Returns
    * (fingerprint, nSamples, sampleRateHz), or None for
    * multi-channel / unsupported widths / bytes no audio reader
    * accepts — a crawled payload must degrade to null, never abort.
    */
  def audioEnvelopeHash(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    if (bytes == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (fmt.getChannels != 1 || !(signed || unsigned) ||
            (bits != 8 && bits != 16)) return None
        val raw = ais.readAllBytes()
        val bpf = bits / 8
        val n = raw.length / bpf
        if (n <= 0) return None
        val blockSum = new Array[Long](64)
        val blockN = new Array[Long](64)
        var global = 0L
        var i = 0
        while (i < n) {
          val level: Long =
            if (bits == 8) {
              val v = raw(i) & 0xffL
              if (signed) (v + 128L) & 0xffL else v
            } else {
              val lo = if (fmt.isBigEndian) raw(2 * i + 1) else raw(2 * i)
              val hi = if (fmt.isBigEndian) raw(2 * i) else raw(2 * i + 1)
              val v = ((hi.toLong << 8) | (lo & 0xffL)) & 0xffffL
              if (signed) (v + 32768L) & 0xffffL else v
            }
          val b = math.min(63, (i.toLong * 64L / n).toInt)
          blockSum(b) += level; blockN(b) += 1L; global += level
          i += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          // BigInt compare: blockSum·n overflows Long past ~2^47
          // samples·levels — 64 BigInt ops per clip, noise next to
          // the decode
          if (blockN(b) > 0 &&
              BigInt(blockSum(b)) * n > BigInt(global) * blockN(b))
            hash |= 1L << b
          b += 1
        }
        Some((hash, n.toLong, math.round(fmt.getSampleRate.toDouble)))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio resample — decode via the JDK's WAV codec, decimate
    * by an integer factor with EXACT box-filter averaging
    * (`out_i = ⌊(s_{ki} + … + s_{ki+k−1}) / k⌋` — the anti-aliasing
    * low-pass a naive every-kth decimation lacks), re-encode 8-bit
    * mono PCM WAV at `rate/k`: the audio analog of
    * [[resizeImageBytes]]'s thumbnail step, fully functional with
    * zero external libraries and deterministic by construction
    * (integer arithmetic, no float filter taps). When no sample
    * rounds (every block sum divisible by k), the decimation
    * preserves [[audioEnvelopeHash]]'s envelope bits exactly — the
    * MultimodalSpec pin. Returns None for payloads outside the 8-bit
    * mono PCM fast path or that no audio reader accepts.
    */
  def resampleWavBytes(bytes: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, s"need a positive decimation factor, got $factor")
    if (bytes == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 8 ||
            !(signed || unsigned)) return None
        val raw = ais.readAllBytes()
        val nOut = raw.length / factor
        if (nOut <= 0) return None
        val out = new Array[Byte](nOut)
        var i = 0
        while (i < nOut) {
          var sum = 0L
          var j = 0
          while (j < factor) {
            val v = raw(i * factor + j) & 0xffL
            sum += (if (signed) (v + 128L) & 0xffL else v)
            j += 1
          }
          out(i) = ((sum / factor) & 0xffL).toByte
          i += 1
        }
        val outRate = fmt.getSampleRate / factor
        val outFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          outRate, 8, 1, 1, outRate, false)
        val outAis = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(out), outFmt, nOut.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(outAis,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Some(bos.toByteArray)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[resampleWavBytes]] over a payload column — adds a nullable
    * `resampled` binary column via one [[mapDecode]] partition pass.
    */
  def resampleWavs(df: DataFrame, factor: Int,
      payloadCol: String = "payload", outCol: String = "resampled"): DataFrame = {
    val schema = StructType(df.schema :+
      StructField(outCol, BinaryType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      Row.fromSeq(r.toSeq :+
        resampleWavBytes(r.getAs[Array[Byte]](payloadIdx), factor).orNull)
    })
  }

  /** [[audioEnvelopeHash]] over a payload column — adds `(afp,
    * n_samples, sample_rate_hz)` nullable columns via one
    * [[mapDecode]] partition pass (the decode happens once; the
    * stream stats ride along for free).
    */
  def decodeAudioFingerprint(df: DataFrame,
      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema :+
      StructField("afp", LongType, nullable = true) :+
      StructField("n_samples", LongType, nullable = true) :+
      StructField("sample_rate_hz", LongType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val out = audioEnvelopeHash(r.getAs[Array[Byte]](payloadIdx))
      Row.fromSeq(r.toSeq :+
        out.map(o => java.lang.Long.valueOf(o._1)).orNull :+
        out.map(o => java.lang.Long.valueOf(o._2)).orNull :+
        out.map(o => java.lang.Long.valueOf(o._3)).orNull)
    })
  }

  // ---------- REAL MP4/ISO-BMFF demux (sample-table walk) ----------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val bodyLen = body.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(8 + bodyLen)
    out.write(be32(8L + bodyLen)); out.write(typ.getBytes("US-ASCII"))
    body.foreach(out.write)
    out.toByteArray
  }

  /** Synthesize a REAL minimal ISO-BMFF (MP4) payload from per-frame
    * byte strings — the video-container analog of [[synthGrayBmp]]/
    * [[synthPcmWav]]: `ftyp` + `mdat` (frame bytes in
    * `chunkFrames`-sized chunks separated by `interChunkPad` zero
    * bytes, so chunk offsets are NOT derivable from frame sizes
    * alone) + `moov` with a full sample table (`stts`/`stsc` run-list
    * /variable-`stsz`/`stco`). The layout is deterministic, so an
    * arithmetic oracle can re-derive every frame offset — while the
    * engine-side [[mp4SampleTable]] must REALLY walk the boxes. One
    * [[mapDecode]] pass; null/empty frame arrays yield a null
    * payload. Frames are ASCII strings (the battery feeds md5 hex).
    */
  def synthMp4(df: DataFrame, framesCol: String, timescale: Int,
      frameDurTicks: Int, chunkFrames: Int, interChunkPad: Int,
      outCol: String = "payload"): DataFrame = {
    require(timescale >= 1 && frameDurTicks >= 1 && chunkFrames >= 1 &&
      interChunkPad >= 0, "need positive timescale/duration/chunking")
    val schema = StructType(df.schema :+
      StructField(outCol, BinaryType, nullable = true))
    val fIdx = df.schema.fieldIndex(framesCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val frames = r.getAs[scala.collection.Seq[String]](fIdx)
      val payload: Array[Byte] =
        if (frames == null || frames.isEmpty) null
        else buildMp4Payload(frames.map(_.getBytes("US-ASCII")),
          timescale, frameDurTicks, chunkFrames, interChunkPad)
      Row.fromSeq(r.toSeq :+ payload)
    })
  }

  /** [[synthMp4]] over BINARY frames (array<binary>) — the container
    * synth for REAL compressed samples (PNG frames for the
    * MJPEG-style layout the [[FrameDecoder]] seam decodes). A null or
    * empty frame array, or any null frame, degrades to a null payload.
    */
  def synthMp4FromBytes(df: DataFrame, framesCol: String, timescale: Int,
      frameDurTicks: Int, chunkFrames: Int, interChunkPad: Int,
      outCol: String = "payload"): DataFrame = {
    require(timescale >= 1 && frameDurTicks >= 1 && chunkFrames >= 1 &&
      interChunkPad >= 0, "need positive timescale/duration/chunking")
    val schema = StructType(df.schema :+
      StructField(outCol, BinaryType, nullable = true))
    val fIdx = df.schema.fieldIndex(framesCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val frames = r.getAs[scala.collection.Seq[Array[Byte]]](fIdx)
      val payload: Array[Byte] =
        if (frames == null || frames.isEmpty || frames.exists(_ == null)) null
        else buildMp4Payload(frames, timescale, frameDurTicks,
          chunkFrames, interChunkPad)
      Row.fromSeq(r.toSeq :+ payload)
    })
  }

  /** The deterministic ISO-BMFF layout shared by [[synthMp4]] and
    * [[synthMp4FromBytes]].
    */
  private def buildMp4Payload(fb: scala.collection.Seq[Array[Byte]],
      timescale: Int, frameDurTicks: Int, chunkFrames: Int,
      interChunkPad: Int): Array[Byte] = {
          val n = fb.length
          val nChunks = (n + chunkFrames - 1) / chunkFrames
          val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0L))
          // mdat body: chunks of frames with inter-chunk padding
          val mdatBody = new java.io.ByteArrayOutputStream()
          val chunkOffsets = new Array[Long](nChunks)
          var c = 0
          while (c < nChunks) {
            if (c > 0) mdatBody.write(new Array[Byte](interChunkPad))
            chunkOffsets(c) = ftyp.length.toLong + 8L + mdatBody.size()
            var i = c * chunkFrames
            while (i < math.min(n, (c + 1) * chunkFrames)) {
              mdatBody.write(fb(i)); i += 1
            }
            c += 1
          }
          val mdat = box("mdat", mdatBody.toByteArray)
          val durTicks = n.toLong * frameDurTicks
          val vf = be32(0L) // version 0 + zero flags
          val mvhd = box("mvhd", vf, be32(0L), be32(0L), be32(timescale.toLong),
            be32(durTicks), be32(0x00010000L), be32(0x01000000L),
            new Array[Byte](8), // reserved
            // identity matrix
            be32(0x00010000L), be32(0L), be32(0L), be32(0L), be32(0x00010000L),
            be32(0L), be32(0L), be32(0L), be32(0x40000000L),
            new Array[Byte](24), be32(2L))
          val tkhd = box("tkhd", be32(7L), be32(0L), be32(0L), be32(1L),
            be32(0L), be32(durTicks), new Array[Byte](16),
            be32(0x00010000L), be32(0L), be32(0L), be32(0L), be32(0x00010000L),
            be32(0L), be32(0L), be32(0L), be32(0x40000000L),
            be32(0L), be32(0L))
          val mdhd = box("mdhd", vf, be32(0L), be32(0L), be32(timescale.toLong),
            be32(durTicks), Array[Byte](0x55, (0xc4 & 0xff).toByte, 0, 0))
          val hdlr = box("hdlr", vf, be32(0L), "vide".getBytes("US-ASCII"),
            new Array[Byte](12), Array[Byte](0))
          val vmhd = box("vmhd", be32(1L), new Array[Byte](8))
          val dref = box("dref", vf, be32(1L), box("url ", be32(1L)))
          val dinf = box("dinf", dref)
          val stsd = box("stsd", vf, be32(1L), box("mp4v", new Array[Byte](8)))
          val stts = box("stts", vf, be32(1L), be32(n.toLong), be32(frameDurTicks.toLong))
          // stsc: one run if every chunk is full, else a tail run for
          // the short last chunk (the spec's run-list semantics)
          val lastN = n - (nChunks - 1) * chunkFrames
          val stsc =
            if (nChunks == 1 || lastN == chunkFrames)
              box("stsc", vf, be32(1L), be32(1L), be32(chunkFrames.toLong), be32(1L))
            else box("stsc", vf, be32(2L),
              be32(1L), be32(chunkFrames.toLong), be32(1L),
              be32(nChunks.toLong), be32(lastN.toLong), be32(1L))
          val stsz = box("stsz", vf, be32(0L), be32(n.toLong),
            fb.toArray.flatMap(f => be32(f.length.toLong)))
          val stco = box("stco", vf, be32(nChunks.toLong),
            chunkOffsets.flatMap(be32))
          val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
          val minf = box("minf", vmhd, dinf, stbl)
          val mdia = box("mdia", mdhd, hdlr, minf)
          val trak = box("trak", tkhd, mdia)
          val moov = box("moov", mvhd, trak)
          ftyp ++ mdat ++ moov
  }

  /** REAL ISO-BMFF demux: walk ftyp/moov/trak/mdia/minf/stbl, expand
    * the `stsc` run list against `stco`/`co64` chunk offsets and
    * fixed-or-variable `stsz` sample sizes, and return every sample's
    * true byte range — (sample_no, offset, size) — the container-level
    * frame extraction a video pipeline runs BEFORE any codec. Pure
    * JVM byte parsing via the same box iterator as the duration
    * probe; no codec, no external libs. Returns None when the
    * payload isn't a well-formed MP4 with a complete sample table —
    * degrade, never abort.
    */
  def mp4SampleTable(b: Array[Byte]): Option[Seq[(Int, Long, Long)]] = {
    if (b == null || b.length < 8) return None
    try {
      val top = mp4Boxes(b, 0, b.length.toLong).take(64).toSeq
      val known = Set("ftyp", "moov", "mdat", "free", "skip", "wide", "pdin", "moof")
      if (top.isEmpty || !known.contains(top.head._1)) return None
      def child(lo: Long, hi: Long, typ: String): Option[(Long, Long)] =
        mp4Boxes(b, lo, hi).take(64).collectFirst { case (`typ`, s, e) => (s, e) }
      for {
        (ms, me) <- top.collectFirst { case ("moov", s, e) => (s, e) }
        (ts, te) <- child(ms, me, "trak")
        (ds, de) <- child(ts, te, "mdia")
        (ns, ne) <- child(ds, de, "minf")
        (ss, se) <- child(ns, ne, "stbl")
        // every declared count is validated against the bytes that
        // must back it BEFORE allocating — a corrupt/hostile count
        // must degrade to None, not attempt a 4-billion-entry Vector
        // (OutOfMemoryError is fatal; the NonFatal catch would not
        // save the executor)
        sizes <- child(ss, se, "stsz").flatMap { case (zs, ze) =>
          val fixed = u32be(b, zs.toInt + 4)
          val count = u32be(b, zs.toInt + 8).toInt
          if (count < 0 || count > b.length) None
          // fixed-size path is byte-backed too: count samples of
          // `fixed` bytes each must fit in the payload, else a few-MB
          // file declaring millions of samples allocates a boxed
          // Vector hundreds of MB large before any range check fires
          else if (fixed != 0)
            (if (fixed > b.length || count.toLong * fixed > b.length) None
             else Some(Vector.fill(count)(fixed)))
          else if (zs + 12 + 4L * count > ze) None
          else Some(Vector.tabulate(count)(i => u32be(b, zs.toInt + 12 + 4 * i)))
        }
        chunks <- child(ss, se, "stco").flatMap { case (cs, ce) =>
          val n = u32be(b, cs.toInt + 4).toInt
          if (n < 0 || cs + 8 + 4L * n > ce) None
          else Some(Vector.tabulate(n)(i => u32be(b, cs.toInt + 8 + 4 * i)))
        }.orElse(child(ss, se, "co64").flatMap { case (cs, ce) =>
          val n = u32be(b, cs.toInt + 4).toInt
          if (n < 0 || cs + 8 + 8L * n > ce) None
          else Some(Vector.tabulate(n)(i => u64be(b, cs.toInt + 8 + 8 * i)))
        })
        runs <- child(ss, se, "stsc").flatMap { case (rs, re) =>
          val n = u32be(b, rs.toInt + 4).toInt
          if (n < 0 || rs + 8 + 12L * n > re) None
          else Some(Vector.tabulate(n)(i => (u32be(b, rs.toInt + 8 + 12 * i),
            u32be(b, rs.toInt + 12 + 12 * i))))
        }
        if sizes.nonEmpty && chunks.nonEmpty && runs.nonEmpty
      } yield {
        // expand stsc runs: run k applies from its first_chunk until
        // the next run's first_chunk (1-based); walk chunks in order,
        // assigning samples and accumulating intra-chunk offsets
        val out = Vector.newBuilder[(Int, Long, Long)]
        var sample = 0
        var run = 0
        var chunk = 0
        while (chunk < chunks.length && sample < sizes.length) {
          while (run + 1 < runs.length && chunk + 1 >= runs(run + 1)._1)
            run += 1
          val spc = runs(run)._2.toInt
          var off = chunks(chunk)
          var j = 0
          while (j < spc && sample < sizes.length) {
            out += ((sample, off, sizes(sample)))
            off += sizes(sample)
            sample += 1; j += 1
          }
          chunk += 1
        }
        out.result()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[mp4SampleTable]] over a payload column — adds a nullable
    * `frames` array<struct<frame_no,frame_off,frame_len,data>> column
    * via one [[mapDecode]] partition pass, each frame's `data` sliced
    * from the payload at its demuxed byte range (explode Spark-side —
    * the distributed per-frame shape).
    */
  def demuxMp4Frames(df: DataFrame,
      payloadCol: String = "payload", outCol: String = "frames"): DataFrame = {
    val frameType = ArrayType(StructType(Seq(
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_off", LongType, nullable = false),
      StructField("frame_len", LongType, nullable = false),
      StructField("data", BinaryType, nullable = true))), containsNull = false)
    val schema = StructType(df.schema :+
      StructField(outCol, frameType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val bytes = r.getAs[Array[Byte]](payloadIdx)
      val frames = mp4SampleTable(bytes).map(_.map { case (i, off, len) =>
        val ok = off >= 0 && len >= 0 && off + len <= bytes.length
        Row(i, off, len,
          if (ok) java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
          else null)
      })
      Row.fromSeq(r.toSeq :+ frames.orNull)
    })
  }

  // ---- external-codec seam ----------------------------------------

  /** 8×8 block-mean aHash over a bare gray8 raster — [[aHashOfImage]]'s
    * arithmetic without any codec, shared by the [[FrameDecoder]] path
    * (a decoded video frame hashes exactly like a decoded image).
    */
  def aHashOfGray(w: Int, h: Int, px: Array[Byte]): Option[Long] = {
    if (w <= 0 || h <= 0 || px == null || px.length < w * h) return None
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var global = 0L
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val v = (px(y * w + x) & 0xff).toLong
        val c = cy * 8 + cx
        cellSum(c) += v; cellN(c) += 1L; global += v
        x += 1
      }
      y += 1
    }
    val nPix = w.toLong * h
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (cellN(c) > 0 &&
          BigInt(cellSum(c)) * nPix > BigInt(global) * cellN(c))
        hash |= 1L << c
      c += 1
    }
    Some(hash)
  }

  /** Pluggable per-frame decode over [[demuxMp4Frames]] output — the
    * [[FrameDecoder]] seam run as one partition-batched pass. Adds
    * `outCol`: array<struct<frame_no,width,height,pixels>>; a frame the
    * decoder can't handle keeps its frame_no with null raster fields
    * (auditable, not silently dropped); a row with no demuxed frames
    * gets a null array.
    */
  def decodeFramesWith(df: DataFrame, decoder: FrameDecoder,
      framesCol: String = "frames", outCol: String = "decoded"): DataFrame = {
    val decType = ArrayType(StructType(Seq(
      StructField("frame_no", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("pixels", BinaryType, nullable = true))), containsNull = false)
    val schema = StructType(df.schema :+ StructField(outCol, decType, nullable = true))
    val fIdx = df.schema.fieldIndex(framesCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val frames = r.getAs[scala.collection.Seq[Row]](fIdx)
      val dec =
        if (frames == null) null
        else frames.map { fr =>
          // positional access: nested struct Rows inside mapPartitions
          // carry no schema — layout is (frame_no, frame_off,
          // frame_len, data) per [[demuxMp4Frames]]
          decoder.decodeFrame(fr.getAs[Array[Byte]](3)) match {
            case Some((w, h, px)) => Row(fr.getInt(0), w, h, px)
            case None => Row(fr.getInt(0), null, null, null)
          }
        }
      Row.fromSeq(r.toSeq :+ dec)
    })
  }

  /** Demux → pluggable decode → per-frame perceptual hash: the whole
    * compressed-video fingerprint pipeline with the codec behind the
    * [[FrameDecoder]] seam, exploded to (id, frame_no, frame_hash)
    * rows in one partition pass. Undecodable frames surface a null
    * hash. Downstream, the hashes feed the SAME banded-Hamming pairing
    * as every other fingerprint ([[Dedup.fingerprintPairs]]) — the
    * codec is the only moving part.
    */
  def frameAHashesWith(df: DataFrame, decoder: FrameDecoder,
      payloadCol: String = "payload", idCol: String = "media_id"): DataFrame = {
    val demuxed = demuxMp4Frames(df, payloadCol, "_frames")
    val schema = StructType(Seq(df.schema(df.schema.fieldIndex(idCol)),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_hash", LongType, nullable = true)))
    val idIdx = demuxed.schema.fieldIndex(idCol)
    val fIdx = demuxed.schema.fieldIndex("_frames")
    mapDecode(demuxed, schema)(rows => rows.flatMap { r =>
      val frames = r.getAs[scala.collection.Seq[Row]](fIdx)
      if (frames == null) Iterator.empty
      else frames.iterator.map { fr =>
        // positional: schema-less nested Rows, layout per demuxMp4Frames
        val hash = decoder.decodeFrame(fr.getAs[Array[Byte]](3))
          .flatMap { case (w, h, px) => aHashOfGray(w, h, px) }
        Row(r.get(idIdx), fr.getInt(0), hash.map(Long.box).orNull)
      }
    })
  }
}

/** External-codec seam — the engine's ONE declared external
  * dependency. Compressed video/audio SAMPLE decode (H.264, AAC, VP9,
  * …) is native-codec territory this image can't ship; the engine
  * demuxes real containers to exact frame byte ranges
  * ([[Multimodal.mp4SampleTable]]) and hands each frame's bytes to
  * this interface. Everything Spark-side is real and spec-tested
  * against the deterministic fake — schema, partition-batched
  * execution, null-on-undecodable, and the downstream per-frame
  * fingerprint — so a real codec (a JNI FFmpeg binding, a JavaCV
  * wrapper) drops in by implementing `decodeFrame` with no operator
  * changes.
  */
trait FrameDecoder extends Serializable {
  /** Codec tag, surfaced in audit columns/logs. */
  def name: String
  /** Decode ONE demuxed sample to a gray8 raster: (width, height,
    * row-major pixels). None = bytes this codec can't decode.
    */
  def decodeFrame(data: Array[Byte]): Option[(Int, Int, Array[Byte])]
}

object FrameDecoder {
  /** Deterministic test fake: a frame whose byte length is a perfect
    * square IS its own √n×√n gray raster; anything else (including
    * null/empty) is undecodable. Exercises both seam paths with zero
    * codec dependencies.
    */
  object SquareGray8Fake extends FrameDecoder {
    val name = "fake-gray8"
    def decodeFrame(data: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      if (data == null || data.length == 0) None
      else {
        val s = math.sqrt(data.length.toDouble).toInt
        if (s * s == data.length) Some((s, s, data)) else None
      }
  }

  /** REAL in-JVM codec through the seam (VERDICT r11 item 5): each
    * demuxed sample is decoded as a complete compressed image by
    * javax.imageio — the MJPEG-style layout where every MP4 sample is
    * an independently-decodable picture (here PNG/BMP/JPEG/GIF,
    * whatever the JDK identifies from the bytes). The raster reduces
    * to gray8 by the engine-wide integer Rec.601 luma
    * ((299r + 587g + 114b) div 1000 — exact identity on gray pixels,
    * which is what makes the battery's lossless-PNG frames
    * oracle-checkable). Bytes no ImageIO reader accepts — including a
    * genuinely compressed-video sample (H.264 etc., still native-codec
    * territory) — return None and surface as null hashes downstream,
    * never an abort.
    */
  object ImageIo extends FrameDecoder {
    val name = "imageio"
    def decodeFrame(data: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (data == null || data.length == 0) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
        if (img == null) return None
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > (64L << 20)) return None
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val luma = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
            px(y * w + x) = luma.toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, px))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }
}
