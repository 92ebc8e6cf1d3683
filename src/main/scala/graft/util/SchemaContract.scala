package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Input-schema drift detector — the cheap insurance round 7 lacked:
  * the driver regenerated events.parquet with `ts` re-encoded
  * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) and 16 battery queries died
  * at analysis with an opaque DATATYPE_MISMATCH each. Verify/Bench now
  * call [[check]] first: every table's actual Spark-read schema is
  * compared against this manifest and each drift prints ONE loud,
  * named line, so an environment change yields a diagnosis instead of
  * a pile of per-query stack traces.
  *
  * The manifest lists the ACCEPTED type set per column — alternatives
  * that the engine's schema-adaptive readers genuinely handle (e.g.
  * events.ts in all three historical encodings) are all listed, so a
  * drift warning means "nobody coded for this yet", never noise.
  */
object SchemaContract {

  private def ts = Set[DataType](LongType, TimestampType, TimestampNTZType)
  private def one(dt: DataType) = Set(dt)
  private def int = Set[DataType](IntegerType, LongType)

  /** table → (column → accepted Spark types). Extra columns in the
    * input are fine (readers select what they need); a MISSING column
    * or an unlisted type is a drift.
    */
  private val manifest: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> int, "r_name" -> one(StringType)),
    "nation" -> Map("n_nationkey" -> int, "n_name" -> one(StringType),
      "n_regionkey" -> int),
    "customer" -> Map("c_custkey" -> int, "c_name" -> one(StringType),
      "c_nationkey" -> int, "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Map("s_suppkey" -> int, "s_name" -> one(StringType),
      "s_nationkey" -> int, "s_acctbal" -> one(DoubleType)),
    "part" -> Map("p_partkey" -> int, "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> int, "p_retailprice" -> one(DoubleType)),
    "orders" -> Map("o_orderkey" -> int, "o_custkey" -> int,
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Map("l_orderkey" -> int, "l_partkey" -> int,
      "l_suppkey" -> int, "l_linenumber" -> int,
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts),
    "events" -> Map("event_id" -> int, "ts" -> ts, "user_id" -> int,
      "event_type" -> one(StringType), "value" -> one(DoubleType),
      "props" -> one(StringType)),
    "documents" -> Map("doc_id" -> int, "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> int),
    "embeddings" -> Map("vec_id" -> int,
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
      "label" -> int))

  /** Compare every manifest table under `sfDir` against its accepted
    * schema; print one `[schema-contract]` line per drift to stderr.
    * Returns the number of drifts (0 = clean). Never throws — a
    * missing table is reported, not fatal, so a partial testdata dir
    * still verifies the queries it can.
    */
  def check(spark: SparkSession, sfDir: String): Int = {
    var drifts = 0
    def warn(msg: String): Unit = {
      drifts += 1
      System.err.println(s"[schema-contract] DRIFT $msg")
    }
    manifest.toSeq.sortBy(_._1).foreach { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      try {
        val actual = spark.read.parquet(path).schema
          .map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, accepted) =>
          actual.get(name) match {
            case None =>
              warn(s"$table.$name: MISSING (expected one of " +
                s"${accepted.map(_.simpleString).mkString("/")})")
            case Some(dt) if !accepted.contains(dt) =>
              warn(s"$table.$name: ${dt.simpleString} not in accepted " +
                s"{${accepted.map(_.simpleString).mkString(", ")}} — " +
                "readers may fail at analysis; teach the adaptive reader " +
                "this encoding")
            case _ => ()
          }
        }
      } catch {
        case e: Exception =>
          warn(s"$table: unreadable at $path (${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString})")
      }
    }
    if (drifts == 0)
      System.err.println(s"[schema-contract] OK — all tables match the manifest at $sfDir")
    drifts
  }
}
