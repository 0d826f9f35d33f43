package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the duplicate-candidate graph (ref:
  * candidate pairs as produced by `Dedup.minhashCandidates`).
  * Complements [[ConnectedComponents]] (cluster MEMBERSHIP) with
  * IMPORTANCE (PageRank: which docs sit at the center of the dup
  * mesh — the template/boilerplate "sources") and DENSITY (triangle
  * counts / local clustering: are candidate clusters cliques, i.e.
  * true dup families, or hub-and-spoke false-positive stars).
  *
  * Both are exact-integer formulations so results hash-match a SQL
  * replay in any engine:
  *   - PageRank holds ranks in 1e-6 units and uses integer division
  *     for the neighbor contribution and the damping multiply — no
  *     float accumulation, so the per-node sum is aggregation-order
  *     invariant and bit-identical across engines and partitionings.
  *   - Triangle counting uses the degree-ordered orientation (each
  *     edge points low→high by (degree, id)), which bounds oriented
  *     out-degree by O(√m) — the standard trick that keeps the wedge
  *     self-join from exploding on hub nodes at corpus scale.
  */
object GraphMetrics {

  /** Undirected edge list (src, dst) — both directions of each
    * candidate pair. Input must be canonical distinct pairs (a < b).
    */
  private def bothDirections(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))

  /** Integer PageRank over the undirected candidate graph, fixed
    * iteration count (the production form: a few synchronous rounds,
    * not convergence detection — rank ORDER stabilizes long before
    * values do).
    *
    * All arithmetic is 64-bit integer: ranks start at 1e6 micro-units
    * per node; each round a node emits `rank DIV degree` to every
    * neighbor and collects `150000 + (850 · Σ contrib) DIV 1000`
    * (damping 0.85 in thousandths). Every node of the pair graph has
    * degree ≥ 1 and (undirected) at least one in-edge, so no dangling
    * mass term is needed.
    *
    * Scale shape: each round is one equi-join (edges ⋈ ranks ⋈ deg on
    * src — a single shuffle on src, AQE-splittable on hub keys) plus
    * one hash aggregation on dst. Edges and degrees are computed once
    * and localCheckpoint'd — the expensive LSH candidate generation
    * upstream runs once, not once per round, and per-round lineage is
    * truncated (the [[ConnectedComponents.labels]] discipline).
    */
  def pageRankInt(pairs: DataFrame, iterations: Int = 3): DataFrame = {
    val edges = bothDirections(pairs).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    var i = 0
    while (i < iterations) {
      val contrib = ranks.join(deg, ranks("node") === deg("src"))
        .select(col("node").as("csrc"), expr("r DIV deg").as("c"))
      ranks = edges.join(contrib, edges("src") === contrib("csrc"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
        .select(col("node"), (lit(150000L) + expr("(850 * s) DIV 1000")).as("r"))
      i += 1
    }
    ranks.select(col("node"), col("r").as("rank_micros"))
      .orderBy(col("rank_micros").desc, col("node"))
  }

  /** Per-node triangle count + local clustering coefficient over the
    * undirected candidate graph.
    *
    * Degree-ordered orientation: every edge points from its lower to
    * its higher endpoint under the total order (degree, id). Wedges
    * are then pairs of out-edges of one node (out-degree is O(√m)
    * under this orientation, so the self-join is bounded even when a
    * boilerplate hub has 10⁶ raw neighbors), and each triangle is
    * found exactly once as wedge (u→v, u→w) closed by oriented edge
    * v→w. The coefficient `2T / (d(d−1))` is a single division of
    * exact integers — hash-safe.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val dg = bothDirections(pairs)
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("dg"))
    // orient low→high by (deg, id)
    val withDeg = e
      .join(dg.select(col("node").as("a_"), col("dg").as("da")), col("a") === col("a_"))
      .join(dg.select(col("node").as("b_"), col("dg").as("db")), col("b") === col("b_"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
    val wedges = oriented.as("e1")
      .join(
        oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.ddst") < col("e2.ddst") ||
            (col("e1.ddst") === col("e2.ddst") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    val closing = oriented.select(col("src").as("cv"), col("dst").as("cw"))
    val tri = wedges.join(closing, col("v") === col("cv") && col("w") === col("cw"))
    val perNode = tri.select(col("u").as("node"))
      .unionByName(tri.select(col("v").as("node")))
      .unionByName(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    dg.join(perNode, Seq("node"), "left")
      .select(
        col("node"),
        col("dg").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        when(col("dg") > 1,
          round(
            (coalesce(col("n_tri"), lit(0L)) * 2).cast("double") /
              (col("dg") * (col("dg") - 1)),
            6))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy("node")
  }
}
