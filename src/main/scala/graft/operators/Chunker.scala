package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{let, tokens}

/** Token-window document chunking — the splitting step every
  * embedding / RAG / context-window-bounded training pipeline runs
  * over its corpus before vectorizing.
  *
  * Chunks are windows of `chunkTokens` whitespace tokens advancing by
  * `chunkTokens - overlapTokens` (consecutive chunks share
  * `overlapTokens` tokens of context); the final window is the
  * remainder — shorter, never empty. Chunk text re-joins tokens with a
  * single space, the whitespace normalization an embedding tokenizer
  * applies anyway. Whitespace-only documents produce no chunks.
  *
  * Scale: pure narrow expressions (split → sequence → explode) — a
  * map-only stage with no shuffle and no UDF that pipelines straight
  * out of the parquet scan. Output rows ≈ ntok/stride per document,
  * and per-task memory is bounded by the input partition size
  * regardless of corpus size; the token array is bound once per row
  * (graft.functions.let) so the interpreted lambda never re-tokenizes.
  *
  * Token-count seam: whitespace tokens (graft.functions.tokens) are a
  * deterministic PROXY for a real subword tokenizer, not an
  * assumption. Both packers budget on whatever integer `tokenCountCol`
  * the caller supplies — precompute a BPE count column (e.g. from an
  * offline tokenizer run) and pass it instead, and every placement
  * follows it (pinned by spec). Only [[chunkByTokens]] is tied to
  * whitespace tokens, because it must split the text itself.
  */
object Chunker {

  /** Adds `chunk_no` (0-based), `chunk` (text), `chunk_tokens` (window
    * token count) — one output row per window, all input columns kept.
    */
  def chunkByTokens(df: DataFrame, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    // tokenless documents (empty, null, or ONLY whitespace — incl.
    // tabs/newlines an ASCII-space trim() prefilter would miss) yield
    // an empty window array, which explode drops: zero output rows
    // with a SINGLE tokenization per row (a separate token-count
    // filter would re-tokenize the whole corpus)
    df.select(col("*"),
        explode(let(tokens(col(textCol)), ts => {
          val ntok = size(ts)
          // ceil((ntok - chunkTokens) / stride) + 1 via double floor —
          // exact (all values << 2^53), avoids expr() for integral div
          val nchunks = when(ntok <= chunkTokens, lit(1)).otherwise(
            floor((ntok - lit(chunkTokens) + lit(stride - 1)).cast("double") / stride)
              .cast("int") + 1)
          val idx = when(ntok === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(0), nchunks - 1))
          transform(idx, i =>
            struct(
              i.cast("long").as("chunk_no"),
              array_join(slice(ts, i * stride + 1, lit(chunkTokens)), " ").as("chunk"),
              // window length by arithmetic, not a second slice
              least(ntok - i * stride, lit(chunkTokens)).cast("long").as("chunk_tokens")))
        })).as("_c"))
      .withColumn("chunk_no", col("_c.chunk_no"))
      .withColumn("chunk", col("_c.chunk"))
      .withColumn("chunk_tokens", col("_c.chunk_tokens"))
      .drop("_c")
  }

  /** Sequence packing — the concatenate-and-cut step that turns a
    * chunked/tokenized corpus into fixed-budget training sequences
    * (GPT-style packing): within each shard, documents are laid out in
    * key order and the stream is cut every `budgetTokens`; a document
    * starts in sequence `floor(prefix_tokens / budget)` at offset
    * `prefix_tokens % budget` (documents may span a cut — exactly
    * concatenation semantics).
    *
    * Shards make it distributed: the running prefix sum is per-shard
    * (ONE window shuffle keyed on the md5 shard of the doc key), never
    * a global single-task ordered scan — at 100 TB each shard packs
    * independently and `shards` scales with executors. All-integer
    * arithmetic, so placement is deterministic across engines and
    * partitionings.
    *
    * Adds `shard`, `seq_id` (per-shard), `seq_offset` (token offset of
    * the document's first token inside its starting sequence).
    *
    * `keyCol` must be unique (it is the only ORDER BY of the per-shard
    * layout): duplicate keys make which duplicate gets which placement
    * nondeterministic across runs and partitionings.
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCountCol: String,
      budgetTokens: Long, shards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(shards >= 1, s"need at least one shard, got $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard",
        pmod(graft.functions.md5Long(col(keyCol).cast("string")), lit(shards.toLong)))
      .withColumn("_prefix",
        coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"_prefix div $budgetTokens")) // integral div: no double roundtrip
      .withColumn("seq_offset", pmod(col("_prefix"), lit(budgetTokens)))
      .drop("_prefix")
  }

  /** Document-boundary ("no-split") sequence packing — greedy first-fit
    * in key order within each shard: a document that would cross the
    * budget starts a new sequence instead of spanning the cut (the
    * variant trainers use when examples must not straddle sequences); a
    * document longer than the budget occupies a sequence of its own.
    *
    * Unlike [[packSequences]], the placement is an inherently
    * sequential recurrence — each document's sequence depends on the
    * padding wasted by every earlier reset, so no closed-form window /
    * prefix sum expresses it. Within a shard it IS a linear scan, and
    * the shard is the unit of distribution exactly as in
    * [[packSequences]]: repartition on the md5 shard, sort within
    * partitions by (shard, key), one stateful pass per partition
    * (the one place `mapPartitions` genuinely beats declarative ops).
    * At 100 TB `shards` scales with executors and every task streams
    * its shards once — no global order, no driver state.
    *
    * Adds `shard`, `seq_id`, `seq_offset`. `keyCol` must be unique
    * (same determinism contract as [[packSequences]]).
    */
  def packSequencesNoSplit(df: DataFrame, keyCol: String, tokenCountCol: String,
      budgetTokens: Long, shards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(shards >= 1, s"need at least one shard, got $shards")
    val staged = df
      .withColumn("shard",
        pmod(graft.functions.md5Long(col(keyCol).cast("string")), lit(shards.toLong)))
      .withColumn("_n", coalesce(col(tokenCountCol).cast("long"), lit(0L)))
    val shardIdx = staged.schema.fieldIndex("shard")
    val nIdx = staged.schema.fieldIndex("_n")
    val outSchema = org.apache.spark.sql.types.StructType(staged.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_offset",
        org.apache.spark.sql.types.LongType, nullable = false)))
    staged
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .mapPartitions { rows =>
        // a hash partition holds whole shards (possibly several);
        // state resets at each shard boundary of the sorted stream.
        // null shards (null keys) sort together and form a group too.
        var cur: Any = PackStateUnset
        var seq = 0L
        var fill = 0L
        rows.map { r =>
          val sh = r.get(shardIdx)
          if (sh != cur) { cur = sh; seq = 0L; fill = 0L }
          val n = r.getLong(nIdx)
          if (fill > 0 && fill + n > budgetTokens) { seq += 1; fill = 0L }
          val off = fill
          fill += n
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ seq :+ off)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .drop("_n")
  }

  /** Sentinel distinct from any shard value (including null). */
  private object PackStateUnset

  /** Length-bucketed batch assignment ("sorted batching") — the
    * padding-waste cure for padded-batch training/inference: within
    * each md5 shard, documents sort by DESCENDING token count (hash,
    * then key, break ties) and chop into consecutive batches of
    * `batchSize`, so each batch holds near-equal lengths and pads
    * only to its own max instead of the corpus max. Deterministic:
    * the layout is a pure function of the key set and counts, the
    * same on any engine or partitioning.
    *
    * Scale shape: identical to [[packSequences]] — one exchange keyed
    * by shard, one rank window of n/shards rows per shard; no global
    * sort. NULL token counts sort as 0 (coalesced), NULL keys drop.
    *
    * Adds `shard`, `batch_no` (0-based per shard), `batch_slot`
    * (0-based within batch), all BIGINT.
    */
  def lengthBatches(df: DataFrame, keyCol: String, tokenCountCol: String,
      batchSize: Int, shards: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    require(shards >= 1, s"need at least one shard, got $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("_lb_n").desc, col("_lb_h"), col("_lb_key"))
    df.withColumn("_lb_key", col(keyCol).cast("string"))
      .filter(col("_lb_key").isNotNull)
      .withColumn("_lb_h", graft.functions.md5Long(col("_lb_key")))
      .withColumn("shard", pmod(col("_lb_h"), lit(shards.toLong)))
      .withColumn("_lb_n", coalesce(col(tokenCountCol).cast("long"), lit(0L)))
      .withColumn("_lb_rank", row_number().over(w).cast("long"))
      .withColumn("batch_no", expr(s"(_lb_rank - 1) div $batchSize"))
      .withColumn("batch_slot", expr(s"(_lb_rank - 1) % $batchSize"))
      .drop("_lb_key", "_lb_h", "_lb_n", "_lb_rank")
  }

  /** Per-batch padding report over a [[lengthBatches]] layout: each
    * batch pads every member to the batch max, so
    * `pad_tokens = max_tok·n_docs − sum_tok` is the exact waste the
    * sorted layout buys back vs. batching in corpus order. One
    * groupBy on the already-assigned (shard, batch_no) keys.
    */
  def paddingReport(assigned: DataFrame, tokenCountCol: String): DataFrame =
    assigned.groupBy(col("shard"), col("batch_no"))
      .agg(count(lit(1)).as("n_docs"),
        max(coalesce(col(tokenCountCol).cast("long"), lit(0L))).as("max_tok"),
        sum(coalesce(col(tokenCountCol).cast("long"), lit(0L))).as("sum_tok"))
      .withColumn("pad_tokens", col("max_tok") * col("n_docs") - col("sum_tok"))

  /** Sequence-budget sizing sweep for the [[packSequences]] (split)
    * layout: for each candidate budget, the exact sequence count and
    * tail-padding waste — WITHOUT running any placement. Split packing
    * concatenates each shard's stream and cuts every `budget` tokens,
    * so per shard `n_seqs = ceil(total/budget)` and the only waste is
    * each shard's final partial sequence: the whole sweep needs just
    * the per-shard token totals (one bounded groupBy; the |shards| ×
    * |budgets| fan-out is a generator over a tiny table). The
    * seq-len-choice table (context length vs step count vs waste) for
    * free, at any corpus size.
    *
    * Output: (budget, n_shards, n_seqs, n_pad, pad_ppm) per budget,
    * ascending; pad_ppm is waste over the padded total.
    */
  def packingBudgetSweep(df: DataFrame, keyCol: String, tokenCountCol: String,
      budgets: Seq[Long], shards: Int): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0), s"positive budgets: $budgets")
    require(shards >= 1, s"need at least one shard, got $shards")
    val totals = df.withColumn("shard",
        pmod(graft.functions.md5Long(col(keyCol).cast("string")), lit(shards.toLong)))
      .groupBy(col("shard")).agg(sum(col(tokenCountCol)).cast("long").as("tot"))
    totals
      .select(col("shard"), col("tot"),
        explode(array(budgets.map(lit): _*)).as("budget"))
      .select(col("budget"),
        expr("(tot + budget - 1) DIV budget").as("ns"), col("tot"))
      .groupBy(col("budget"))
      .agg(count(lit(1)).as("n_shards"), sum(col("ns")).as("n_seqs"),
        (sum(col("ns") * col("budget")) - sum(col("tot"))).as("n_pad"))
      .withColumn("pad_ppm", expr(
        "CASE WHEN n_seqs = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_pad * 1000000) DIV (n_seqs * budget) END"))
      .orderBy(col("budget"))
  }
}
