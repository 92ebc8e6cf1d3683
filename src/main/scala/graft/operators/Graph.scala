package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables as iterated equi-joins — the
  * Pregel plan expressed declaratively, the same discipline as
  * [[Dedup.nearDupClusters]]'s hash-to-min rounds: each superstep is
  * one join on the node key plus one aggregate, so a k-step algorithm
  * costs k bounded shuffles and scales with executors, never with a
  * driver-side adjacency structure.
  */
object Graph {

  /** Fixed-iteration PageRank in exact 1e6 fixed point — the
    * centrality screen for graph-shaped corpus artifacts (near-dup
    * candidate graphs: which doc is the HUB of a mirror cluster;
    * citation/link graphs: which page anchors the crawl). Fixed
    * point, fixed iteration count, and floor division at every step
    * make the result bit-identical across partitionings AND engines —
    * the battery oracle (q142) replays the same three supersteps as
    * unrolled CTEs.
    *
    *   out_t(u) = pr_t(u) div deg(u)
    *   pr_{t+1}(v) = (1e6 − α) + (α · Σ_{u→v} out_t(u)) div 1e6
    *
    * with α in ppm (850000 = the classic 0.85). `undirected` doubles
    * each edge so every node has deg ≥ 1 and an in-edge — no dangling
    * mass on symmetric graphs (candidate-pair graphs are symmetric by
    * construction). Convergence to the eigenvector needs ~log(n)
    * rounds; screens read the ORDERING, which stabilizes in a handful.
    *
    * Scale shape: per iteration one shuffle joining ranks to edge
    * sources and one groupBy on destinations — edges never leave their
    * hash partitioning, so AQE reuses the exchange across rounds;
    * lineage is cut every few rounds so long runs don't replan a
    * growing DAG.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, alphaPpm: Long = 850000L,
      undirected: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(alphaPpm >= 0 && alphaPpm <= 1000000L,
      s"alphaPpm must be in [0, 1e6], got $alphaPpm")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (undirected)
        fwd.unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      else fwd).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("out"))
      pr = contrib.groupBy(col("node"))
        .agg(sum(col("out")).as("_m"))
        .select(col("node"),
          (lit(1000000L - alphaPpm) +
            expr(s"(${alphaPpm}L * _m) div 1000000L")).as("pr"))
      if (i % 4 == 0 && i < iters) pr = pr.localCheckpoint()
    }
    pr
  }

  /** Triangle enumeration over an undirected edge set given as
    * (id_a < id_b) pairs — the cluster-density probe of a near-dup
    * candidate graph: triangles are what distinguish a tight mirror
    * cluster (every pair agrees) from a hub-and-spokes artifact of
    * banding (pairs share a hub but not each other), which is the
    * difference between "dedup the whole cluster to one survivor"
    * and "verify pairwise before collapsing".
    *
    * Output: one row per triangle (a < b < c), ordered.
    *
    * Scale shape: the classic node-ordered enumeration — both joins
    * are equi-joins on a node key, and because edges are oriented
    * low→high, each wedge (a<b<c with a-b, b-c) is generated exactly
    * once and closed by one hash probe of the (a, c) edge. Work is
    * Σ deg²(v) over LOW-degree orientation, the standard bound;
    * candidate-pair graphs are sparse by LSH construction so the
    * wedge stream stays linear-ish in edges.
    */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("id_a"), col("id_b")).distinct()
    e.as("ab")
      .join(e.as("bc"), col("ab.id_b") === col("bc.id_a"))
      .select(col("ab.id_a").as("a"), col("ab.id_b").as("b"),
        col("bc.id_b").as("c"))
      .join(e.as("ac"),
        col("a") === col("ac.id_a") && col("c") === col("ac.id_b"))
      .select(col("a").as("id_a"), col("b").as("id_b"), col("c").as("id_c"))
      .orderBy(col("id_a"), col("id_b"), col("id_c"))
  }

  /** Degree distribution of an undirected pair graph — the structural
    * one-pager between q132's cluster-size histogram and q162's
    * triangle census: how many nodes carry how many edges. Read it
    * before pair-expensive work (a fat tail = hub nodes = the
    * boilerplate/template families the dedup caps exist for; the
    * per-node degree bound is what makes wedge enumeration safe).
    *
    * Cost: one direction-union + a node-keyed count + a degree-keyed
    * count — output rows bounded by the distinct degree count.
    *
    * Output: (degree, n_nodes, n_nodes_ge) — cumulative from the
    * highest degree down — ordered by degree descending.
    */
  def degreeHistogram(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
      .distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("degree").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .withColumn("n_nodes_ge", sum(col("n_nodes")).over(w).cast("long"))
      .orderBy(col("degree").desc)
  }
}
