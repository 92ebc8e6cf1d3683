package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Design for 100 TB: every variant is
  * shingle→hash→(band)→shuffle-by-small-key, i.e. the only wide
  * exchanges are group-bys on a hash or band bucket — never an
  * all-pairs join. Candidate pairs come out of LSH buckets whose size
  * is bounded by the band width, so the quadratic step is local per
  * bucket and skew-resistant (pathological buckets can be salted or
  * capped upstream). Hashes are md5-derived so results are
  * engine-reproducible (see graft.functions.md5Long).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text with the
    * minimum id as the keeper and the duplicate count. Single
    * shuffle on the 128-bit hash — at 100 TB this is the cheapest
    * possible exact dedup (no text comparison after the map side).
    */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: `k` minimum md5-hashes over word `n`-gram
    * shingles, one array column. Pure expressions — the per-row cost is
    * k×|shingles| hashes with no shuffle at all.
    */
  def minhashSignature(text: Column, k: Int, n: Int = 3): Column = {
    val sh = shingles(text, n)
    val sigs = (0 until k).map { seed =>
      array_min(transform(sh, s => md5LongSeeded(seed, s)))
    }
    array(sigs: _*)
  }

  /** MinHash-LSH candidate pairs: signatures are split into `bands`
    * bands of `rowsPerBand` hashes; docs sharing any band bucket become
    * a candidate pair. Returns (id_a, id_b) with id_a < id_b, distinct.
    *
    * Plan shape: project signature → explode bands (×bands rows) →
    * shuffle by (band, bucket) → per-bucket self-join. The self-join is
    * an equi-join on the bucket key, so Spark plans a shuffled hash
    * join keyed on tiny bucket ids — no cartesian anywhere.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, n).as("sig"))
    val bandBuckets = transform(sequence(lit(0), lit(bands - 1)), b => {
      val bandSlice = slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
      md5(array_join(transform(bandSlice, x => x.cast("string")), ","))
    })
    val banded = withSig.select(col("id"),
      posexplode(bandBuckets).as(Seq("band", "bucket")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** SimHash: `bits`-bit fingerprint over whitespace tokens. Bit j of
    * the result is the sign of Σ_tokens (bit_j(md5Long(token)) ? +1 : -1).
    * Near-dup docs land within small Hamming distance. Pure per-row
    * expressions (no shuffle).
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    val hashes = transform(tokens(lower(text)), t => md5Long(t))
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs. `candidates`
    * must have (id_a, id_b); df provides (id, text). Intended as the
    * verify stage after [[minhashLshPairs]] — joins are equi-joins on
    * ids and the set ops run per-row on the joined shingle arrays.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        ratio(size(array_intersect(col("sh_a"), col("sh_b"))),
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, bucketed
    * by sign-bit LSH to avoid the all-pairs join (see
    * [[Similarity.signBucket]]).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, signBits: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      Similarity.signBucket(col(embCol), signBits).as("bucket"))
    val l = b.as("l"); val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("score_1e6"))
      .filter(col("score_1e6") >= math.floor(threshold * 1e6).toLong)
  }
}
