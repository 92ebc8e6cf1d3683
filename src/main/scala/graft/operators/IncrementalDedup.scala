package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-on-ingest against corpus history: each incoming batch is
  * exact-deduplicated against EVERYTHING ever ingested — without
  * rescanning the corpus — by keeping a content-hash index in a
  * [[VersionedTable]] (record key = the md5 of the content). The
  * pattern every continuously-fed training corpus needs: batch N+1
  * must not re-admit what batch 1 already contributed.
  *
  * Scale: the index holds one ~50-byte row per DISTINCT document ever
  * seen — orders of magnitude smaller than the corpus — and is
  * key-hash-bucketed by the same table machinery the lake uses, so
  * the anti-join of a batch against history shuffles the batch on the
  * hash (small side) against bucketed index files; only touched
  * buckets rewrite on commit. History never rescans, the corpus never
  * re-shuffles.
  */
object IncrementalDedup {

  /** Admit `batch`'s novel content into the index and return the
    * admitted rows — (h, doc_id, batch_no) — where novel means: not
    * in any previous batch (index anti-join), and the FIRST occurrence
    * (min id) within this batch for content duplicated inside it.
    *
    * The index table must use record key "h" (any precombine column
    * present in the written schema, e.g. "batch_no"). Idempotent
    * per content: re-ingesting a batch admits nothing new.
    */
  def appendNovel(index: VersionedTable, batch: DataFrame,
      idCol: String, textCol: String, batchNo: Long): DataFrame = {
    require(index.recordKey == "h",
      s"hash index must be keyed on 'h', got '${index.recordKey}'")
    val hashed = batch.select(md5(col(textCol)).as("h"), col(idCol).as("doc_id"))
    val firsts = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
    val novel = (index.snapshotOpt match {
      case Some(existing) => firsts.join(existing.select(col("h")), Seq("h"), "left_anti")
      case None => firsts
    }).withColumn("batch_no", lit(batchNo))
      .localCheckpoint(true) // pin the admitted set BEFORE the commit mutates the index
    if (!novel.isEmpty) index.upsert(novel)
    novel
  }
}
