package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * Image decode is REAL for JDK-native formats (see
  * [[decodeImageMetaJvm]]: PNG/JPEG/BMP/GIF via javax.imageio). The
  * container ships no audio/video codecs, so those decode steps remain
  * a clearly-marked DETERMINISTIC STUB (features derived from the
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
      payloadCol: String = "payload", metaCol: String = "meta"): DataFrame = {
    val schema = StructType(df.schema.map {
      case f if f.name == metaCol => f.copy(dataType = mediaSchema("meta").dataType)
      case f => f
    })
    val payloadIdx = schema.fieldIndex(payloadCol)
    val metaIdx = schema.fieldIndex(metaCol)
    mapDecode(df, schema)(rows => rows.map { r =>
      val meta = decodeImageHeader(r.getAs[Array[Byte]](payloadIdx))
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
}
