package graft

import org.apache.spark.sql.SparkSession
import graft.sources.BinaryFiles

/** Scratch: drive distributed file hashing over real files. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    BinaryFiles.hashFiles(spark, args(0))
      .select("path", "length", "sha256")
      .collect().foreach(r => println(s"[hash] ${r.getString(2)}  ${r.getString(0)} (${r.getLong(1)}b)"))
    spark.stop()
  }
}
