package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph scoring over a co-occurrence graph — the
  * link-graph-derived quality signal of large-corpus curation (page
  * importance over a web graph is a standard document-quality feature
  * when filtering crawl data; the reference side of this is the
  * entity-relationship scoring in tasks.py:105-563, which weights
  * taxonomy entities by co-occurrence strength).
  *
  * PageRank here is DETERMINISTIC BY CONSTRUCTION: rank mass is an
  * int64 scaled by 10^12, every update is integer floor-division and
  * an order-independent integer sum, so the result is bit-identical
  * under any partitioning — the same quantize/reduce-in-integers
  * recipe as the q32 kmeans, and what makes the DuckDB oracle replay
  * the iterations exactly (float PageRank diverges across engines in
  * the last ulps and is unhashable).
  *
  * Scale shape: the graph is held as ADJACENCY LISTS (node,
  * neighbors[]) built in one groupBy — multi-edge dedup rides that
  * same shuffle via array_distinct, the degree is size(neighbors)
  * for free, and the cached graph is node-sized rows instead of an
  * edge-sized table. Each iteration is a node-keyed join + a
  * map-side explode + a partially-aggregated groupBy on dst — the
  * canonical distributed PageRank step. Nothing corpus-sized reaches
  * the driver (the only scalar is the node count).
  */
object Graph {

  /** Rank mass scale: ranks are int64 fractions of 10^12. */
  val RankScale = 1000000000000L

  /** Raw co-purchase pairs: parts linked when they appear in the same
    * order, both directions, NOT deduplicated (pagerank's adjacency
    * build dedups on its own shuffle — a separate distinct pass would
    * pay one more edge-sized exchange for nothing). Bounded fan-out:
    * an order has at most a handful of lines, so the per-order pair
    * expansion is O(lines^2) with a small constant — never a hot-key
    * hazard.
    *
    * Shape: ONE groupBy on the order key gathers each order's part
    * set (map-side combinable, bounded arrays by schema contract),
    * then the pair expansion is a per-row double explode — no
    * self-join, no second pass over the fact table; lineitem is
    * scanned exactly once (at 100 TB the scan is the bill). */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"),
        explode(expr("filter(parts, p -> p != src)")).as("dst"))
  }

  /** Deduplicated co-purchase edge set — the public (src, dst) view
    * of the graph for edge-level consumers and the symmetry spec. */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    copurchasePairs(spark, dir).distinct()

  /** Integer PageRank over (src, dst) edges (multi-edges collapse),
    * `iters` fixed iterations, damping 0.85 expressed as exact
    * integer arithmetic:
    *
    *   per      = RankScale div n
    *   rank_0   = per
    *   rank_t+1 = (15 * per) div 100
    *              + (85 * sum_{u->v} (rank_t(u) div outdeg(u))) div 100
    *
    * Every node in the (symmetric) edge set has outdeg >= 1, so there
    * are no dangling nodes; the damped leak (floor losses + the
    * undistributed 15% remainder) is the standard simplified-PageRank
    * contract and identical in any engine. Overflow audit: total rank
    * mass <= RankScale = 10^12, so 85 * sum <= 8.5e13 << 2^63.
    *
    * The graph caches as adjacency rows for the duration of the
    * computation (the node-count job materializes it); the final
    * node-sized state is truncated with localCheckpoint and the cache
    * RELEASED — no immortal persist escapes this function. Fixed,
    * small iteration count, so the growing plan needs no per-round
    * checkpoint (a durable checkpoint dir replaces localCheckpoint on
    * a real cluster, as in Pipeline.labelPropagate). */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    // one shuffle builds adjacency + dedup + degree together; skew
    // note: a node's neighbor array is bounded by the node count of
    // its connected component's frontier — for real power-law graphs
    // cap/sample neighbor lists upstream
    val adj = edges.groupBy(col("src"))
      .agg(array_distinct(collect_list(col("dst"))).as("nbrs"))
      .select(col("src").as("node"), col("nbrs"),
        size(col("nbrs")).cast("long").as("outdeg"))
      .persist()
    // node count: the one driver-side scalar (an aggregate, not
    // data); also forces the cache
    val n = adj.count()
    require(n > 0, "pagerank needs a non-empty edge set")
    val per = RankScale / n
    val base = 15L * per / 100L
    // the state CARRIES its adjacency (node, nbrs, outdeg, rank):
    // the send step explodes straight from the state, so each
    // iteration is ONE node-keyed join (reattach the new rank to the
    // cached adjacency) + one partially-aggregated groupBy — not the
    // two joins of the (node, rank)-only formulation, which had to
    // join adj a second time just to find the neighbor lists
    var state = adj.withColumn("rank", lit(per))
    for (_ <- 1 to iters) {
      val inc = state
        .select(explode(col("nbrs")).as("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("inc"))
      state = adj
        .join(inc, col("node") === col("dst"), "left")
        .select(col("node"), col("nbrs"), col("outdeg"),
          (lit(base) + expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
    }
    // node-sized: drop the arrays, one cheap materialization so the
    // cache can drop
    val out = state.select(col("node"), col("outdeg"), col("rank"))
      .localCheckpoint()
    adj.unpersist()
    out
  }

  /** Top 20 parts by co-purchase PageRank after 3 iterations —
    * deterministic total order (rank DESC, part ASC), int64 ranks. */
  def q53Pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerank(copurchasePairs(spark, dir), iters = 3)
      .select(col("node").as("part_key"), col("outdeg").as("out_degree"),
        col("rank"))
      .orderBy(col("rank").desc, col("part_key").asc)
      .limit(20)
}
