package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.charShingles

/** Fuzzy entity resolution — the approximate string matching a
  * registry-linkage pipeline needs (patient/provider name variants,
  * typo'd identifiers) expressed as blocking + verify, never an n²
  * cross join.
  *
  * Blocking contract (pigeonhole): one edit destroys at most `q`
  * character q-grams, so two strings within edit distance `maxDist`
  * share at least one q-gram whenever their gram count exceeds
  * q·maxDist — for strings longer than ~q·(maxDist+1) characters the
  * blocked result EQUALS the unblocked one, which is what lets the
  * oracle check it against a direct all-pairs formulation. Shorter
  * strings may be missed (documented recall edge, same trade as every
  * q-gram blocker).
  */
object FuzzyJoin {

  /** Self-join: pairs (id_a < id_b) whose normalized (lower/trim)
    * names are within `maxDist` edits, blocked on shared character
    * q-grams. `maxGramDf` drops grams shared by more than that many
    * rows before pairing — the skew valve for corpora where a
    * boilerplate prefix would otherwise degenerate blocking toward n²
    * (pairs whose ONLY shared grams are dropped are lost; size it
    * above the true-match gram frequencies).
    */
  def editDistancePairs(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int, q: Int = 3, maxGramDf: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val grams = grammed(df, idCol, nameCol, q, maxGramDf)
    // distance is computed and filtered ON the gram-partitioned stream,
    // BEFORE the dedup shuffle: a pair sharing g grams is re-verified g
    // times (cheap — levenshtein on two short strings), but the
    // exchange then carries only true matches instead of every
    // candidate duplicated per shared gram with both name payloads —
    // on boilerplate-heavy corpora (shared prefixes) that is the
    // difference between shuffling |matches| rows and shuffling
    // Σ_gram |L_g|·|R_g| wide rows.
    grams.as("a")
      .join(grams.as("b"), col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Two-table record linkage: every (left, right) pair within
    * `maxDist` edits — same blocking contract and skew valve as
    * [[editDistancePairs]] (the hot-gram cap counts across BOTH
    * sides). Output: (id_l, id_r, dist).
    */
  def editDistanceJoin(left: DataFrame, leftId: String, leftName: String,
      right: DataFrame, rightId: String, rightName: String,
      maxDist: Int, q: Int = 3, maxGramDf: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    // cap on combined gram frequency, so one side's boilerplate can't
    // flood the other side's blocking buckets
    // the hot set is MATERIALIZED (localCheckpoint): it is consumed by
    // BOTH sides' anti-joins, and without cutting lineage each
    // consumer would re-run the two full gram scans that feed it —
    // the set itself is tiny (only grams above the cap)
    val hot = maxGramDf.map { cap =>
      grammed(left, leftId, leftName, q, None)
        .unionByName(grammed(right, rightId, rightName, q, None))
        .groupBy(col("gram")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > cap).select(col("gram"))
        .localCheckpoint()
    }
    def side(df: DataFrame, id: String, nm: String): DataFrame = {
      val g = grammed(df, id, nm, q, None)
      hot.fold(g)(h => g.join(broadcast(h), Seq("gram"), "left_anti"))
    }
    // same verify-before-shuffle shape as [[editDistancePairs]]: the
    // distance filter runs on the gram-partitioned stream so the dedup
    // exchange carries only matches, never the per-gram-duplicated
    // candidate pairs with name payloads
    side(left, leftId, leftName).as("l")
      .join(side(right, rightId, rightName).as("r"), col("l.gram") === col("r.gram"))
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"),
        levenshtein(col("l.nm"), col("r.nm")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  private def grammed(df: DataFrame, idCol: String, nameCol: String,
      q: Int, maxGramDf: Option[Long]): DataFrame = {
    // The narrow (id, name) projection is hash-repartitioned BEFORE
    // the gram explode: the explode multiplies rows ~|name|× and the
    // per-candidate levenshtein verification multiplies work again, so
    // the verify stage's parallelism must come from the cluster, not
    // from however few splits the upstream scan produced (a broadcast
    // gram join keeps the probe side's partitioning — measured: every
    // levenshtein of a 1.5M-candidate block ran in ONE task off a
    // single-file scan). The partition count is pinned explicitly:
    // an unnumbered repartition is fair game for AQE to coalesce back
    // to one partition when the shuffled BYTES are small, but bytes
    // are the wrong currency here — each narrow row fans out to
    // grams × candidates × levenshtein downstream. Cost: one shuffle
    // of two short columns, noise next to the work it parallelizes.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df.select(col(idCol).as("id"), lower(trim(col(nameCol))).as("nm"))
      .repartition(n, col("id"))
      .withColumn("gram", explode(charShingles(col("nm"), q)))
    maxGramDf match {
      case None => base
      case Some(cap) =>
        val hot = base.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") > cap).select(col("gram"))
        base.join(broadcast(hot), Seq("gram"), "left_anti")
    }
  }

  /** Mutual-best one-to-one matching over [[editDistanceJoin]] pairs —
    * keep (l, r) only when r is l's closest right-side candidate AND l
    * is r's closest left-side candidate (ties broken on lowest partner
    * id, so the tier is deterministic on any engine). This is the
    * "sure match" tier of record linkage: a candidate pair table says
    * who COULD match; the mutual-argmax filter is what merge/survivor
    * pipelines actually act on, because it can never link one record
    * to two masters.
    *
    * Both argmaxes are `min(struct(dist, partner))` aggregates —
    * bounded state, map-side combinable, no per-key sort window — so
    * the step costs two shuffles of the (already small) candidate
    * table. Output: (id_l, id_r, dist), at most one row per id_l and
    * per id_r.
    */
  def mutualBestMatch(pairs: DataFrame): DataFrame = {
    // both argmax aggregations consume `pairs`; materialize it once
    // (candidate-match tables are small — blocking + the distance
    // filter already ran) instead of re-running the full blocking
    // pipeline, scans included, per consumer
    val p = pairs.localCheckpoint()
    val bl = p.groupBy(col("id_l"))
      .agg(min(struct(col("dist"), col("id_r"))).as("_b"))
      .select(col("id_l"), col("_b.id_r").as("id_r"), col("_b.dist").as("dist"))
    val br = p.groupBy(col("id_r"))
      .agg(min(struct(col("dist"), col("id_l"))).as("_b"))
      .select(col("id_r"), col("_b.id_l").as("id_l"))
    bl.join(br, Seq("id_l", "id_r"))
      .select(col("id_l"), col("id_r"), col("dist"))
  }
}
