package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed file-content hashing (S3/F6): the reference hashes files
  * on the driver in 8 KiB chunks (etl/ingest.py:18-25); at lake scale
  * the same provenance hash is computed by executors from a binaryFile
  * scan — one row per file, sha2 over the content bytes, no data ever
  * on the driver.
  *
  * For multi-GB objects swap `binaryFile` for a mapPartitions stream
  * over FileSystem.open with per-block hashes; the output contract
  * (path, length, sha256) stays identical.
  */
object BinaryFiles {

  def hashFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        col("path"),
        col("length"),
        lower(sha2(col("content"), 256)).as("sha256"),
        col("modificationTime"))

  /** Batch-id column builder (F7): `<source>_<file dots→underscores>_<utc ts>`
    * as a pure column expression over a binaryFile scan — the
    * distributed version of Provenance.batchId.
    */
  def batchIdColumn(source: String): org.apache.spark.sql.Column =
    concat_ws("_",
      lit(source),
      regexp_replace(element_at(split(col("path"), "/"), -1), "\\.", "_"),
      date_format(current_timestamp(), "yyyyMMddHHmmss"))
}
