package graft.streaming

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Pipeline

/** Streaming twin of [[graft.Pipeline.ingest]]: a Structured Streaming
  * file watch over `<sourceBase>/<source>/<file>` that registers each
  * newly arrived file as an INGESTED batch through the same
  * copy + hash + provenance flow as the batch stage.
  *
  * The stream DISCOVERS files via the binaryFile source with only the
  * `path` column projected — no payload bytes are read — so any source
  * format rides the same watch. CAVEAT: Spark file sources skip
  * zero-byte files entirely, so pair the watch with a periodic
  * idempotent sweep (`Pipeline.ingest(sourceBase, skipIfSeen = true)`)
  * to catch empty drops. Exactly-once registration holds two
  * ways: the file-source checkpoint dedups across restarts, and
  * `Pipeline.ingestFile(skipIfSeen = true)` consults the control plane
  * before registering — so even a replay after checkpoint loss appends
  * no duplicate provenance events.
  *
  * Scale: discovery is Spark's incremental file listing (the same
  * mechanism that tails 100k-file drop zones); per-file control-plane
  * work is driver-side and tiny, and the record-level stages stay the
  * normal distributed batch operators downstream.
  */
object StreamingIngest {

  /** Start the watch. `Trigger.AvailableNow` by default: drain all
    * currently visible files, then stop — the idempotent "poll" shape;
    * pass a processing-time trigger for a resident watcher.
    */
  def start(spark: SparkSession, pipeline: Pipeline, sourceBase: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // binaryFile: one row per file, and projecting only `path` prunes
    // the content column so discovery reads no payload bytes. CAVEAT:
    // Spark file sources drop zero-byte files when forming read
    // partitions, so empty files never surface from ANY streaming
    // format — pair the watch with a periodic idempotent batch sweep
    // (Pipeline.ingest(sourceBase, skipIfSeen = true)) to catch them.
    // The format's schema is fixed but streaming sources require it
    // stated explicitly.
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile").schema(binSchema)
      .load(s"$sourceBase/*/*")
      .select(col("path").as("file_path"))
    val registerBatch: (DataFrame, Long) => Unit = (batch, _) => {
      batch.select("file_path").distinct().collect().map(_.getString(0)).sorted
        .foreach { uri =>
          val p = toLocalPath(uri)
          val source = p.getParent.getFileName.toString
          pipeline.ingestFile(source, p, skipIfSeen = true)
        }
    }
    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(registerBatch)
      .start()
  }

  private def toLocalPath(uri: String): Path =
    if (uri.startsWith("file:")) Paths.get(java.net.URI.create(uri))
    else Paths.get(uri)
}
