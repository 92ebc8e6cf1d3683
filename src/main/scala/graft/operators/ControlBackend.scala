package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Storage seam for the control plane. The reference keeps all batch /
  * step / rule / audit state in Postgres behind a tiny DB module
  * (reference: etl/db.py:12-63; tables in db/init.sql:3-98); the engine
  * only ever needs two verbs per control table — INSERT rows and
  * SELECT * — so that pair is the whole contract. `Provenance` derives
  * every state view relationally on top of `read`, which keeps the
  * backend swappable: parquet for a lake-native control plane, JDBC
  * (append = batched INSERT, read = SELECT *) where an RDBMS is the
  * system of record like the reference's Postgres.
  */
trait ControlBackend {
  def append(table: String, df: DataFrame): Unit
  def read(table: String)(empty: => DataFrame): DataFrame
  /** Storage-maintenance hook; no-op for stores that self-compact
    * (an RDBMS needs nothing here).
    */
  def compact(table: String): Unit = ()
}

/** Append-only parquet event log per control table under
  * `<root>/_control/`. Every append is a tiny parquet file, so the
  * backend self-compacts: once a table exceeds `autoCompactAt` part
  * files, it is rewritten as a single consolidated file set (write to
  * temp + dir swap, so readers see either the old or the new layout).
  * Control-plane appends are driver-side and serialized per pipeline
  * (mirroring the reference's single-threaded UPDATE flow), which makes
  * the count-then-compact check race-free in practice.
  */
final class ParquetControlBackend(spark: SparkSession, root: String,
    autoCompactAt: Int = 64) extends ControlBackend {

  private def dir(table: String) = s"$root/_control/$table"

  private def partFileCount(table: String): Int = {
    val p = Paths.get(dir(table))
    if (!Files.isDirectory(p)) 0
    else Files.list(p).iterator().asScala.count(_.toString.endsWith(".parquet"))
  }

  override def append(table: String, df: DataFrame): Unit = {
    df.write.mode(SaveMode.Append).parquet(dir(table))
    if (autoCompactAt > 0 && partFileCount(table) > autoCompactAt) compact(table)
  }

  override def read(table: String)(empty: => DataFrame): DataFrame =
    if (Files.exists(Paths.get(dir(table)))) spark.read.parquet(dir(table)) else empty

  override def compact(table: String): Unit = {
    val p = Paths.get(dir(table))
    if (Files.exists(p)) {
      val df = spark.read.parquet(dir(table)).coalesce(1)
      val tmp = dir(table) + "_compact_tmp"
      df.write.mode(SaveMode.Overwrite).parquet(tmp)
      val old = dir(table) + "_old"
      Files.move(p, Paths.get(old), StandardCopyOption.REPLACE_EXISTING)
      Files.move(Paths.get(tmp), p, StandardCopyOption.REPLACE_EXISTING)
      // best-effort cleanup of the old generation
      Files.walk(Paths.get(old)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}

/** RDBMS-contract stand-in: rows live in driver memory, appends are
  * transactional row inserts, reads rebuild a DataFrame from the stored
  * rows — behaviorally what a JDBC backend returns from SELECT *. Used
  * by the contract tests to prove `Provenance` is backend-agnostic
  * (the image ships no Postgres, so the real JDBC impl can't run here).
  */
final class InMemoryControlBackend(spark: SparkSession) extends ControlBackend {

  private val tables = TrieMap.empty[String, (StructType, Vector[Row])]

  override def append(table: String, df: DataFrame): Unit = synchronized {
    val rows = df.collect().toVector
    tables.get(table) match {
      case Some((schema, existing)) => tables.update(table, (schema, existing ++ rows))
      case None => tables.update(table, (df.schema, rows))
    }
  }

  override def read(table: String)(empty: => DataFrame): DataFrame =
    tables.get(table) match {
      case Some((schema, rows)) => spark.createDataFrame(rows.asJava, schema)
      case None => empty
    }
}
