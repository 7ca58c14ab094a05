package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics. PageRank is the web-curation quality signal the
  * large corpus pipelines derive from a crawl's link graph (harmonic/
  * PageRank centrality feeds quality weighting); here it runs over any
  * (src, dst) edge frame.
  *
  * Determinism contract (what makes an iterative float computation
  * hash-comparable across engines): every per-iteration contribution
  * r(u)/outdeg(u) is rounded to a 1e-12-scaled integer BEFORE the
  * per-destination sum, so the sum is order-free (integer addition
  * commutes; the t19/t20 scaled-sum lesson applied to iteration), and
  * the new rank (1-d)/N + d·(sum/1e12) is the same double on every
  * engine by induction. No other float op depends on aggregation order.
  *
  * Scale posture: each iteration is ONE join (ranks ⨝ edges on src) +
  * ONE aggregation (sum per dst) — the canonical distributed PageRank;
  * the edge frame is persisted once and co-partitioning edges by src
  * (bucketed layout) makes the per-iteration join exchange-free on the
  * edge side. Ranks are node-sized. Iterations are a fixed small count
  * (the unrolled-SQL-oracle regime), not convergence-tested. */
object Graph {

  /** PageRank over a directed edge list. Dangling nodes (no out-edges)
    * are not redistributed — pass a symmetrized edge set (every node
    * with an in-edge also has an out-edge) for the classic ergodic
    * setup; the battery's order graph is symmetric by construction.
    * Returns (node, outdeg, rank) with rank rounded to 6 decimals. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      damping: Double = 0.85
  ): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node count is one scalar of metadata; the teleport term needs it
    // inside every iteration's projection. Under the documented
    // symmetrized-input contract every node has an out-edge, so N is
    // deg's row count — no explode-distinct pass over the edges
    val n = deg.count()
    val teleport = lit(1.0 - damping) / n.toDouble
    var ranks = deg.select(col("src").as("node"),
      (lit(1.0) / n.toDouble).as("rank"))
    for (i <- 0 until iters) {
      ranks = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"),
          round(col("rank") / col("outdeg") * 1e12).cast("long").as("q12"))
        .groupBy("dst")
        .agg(sum("q12").as("s12"))
        .select(col("dst").as("node"),
          (teleport + lit(damping) * (col("s12") / 1e12)).as("rank"))
      // truncate the lineage every SECOND pass (the CC operators' pattern,
      // batched): without checkpoints the driver re-analyzes a plan that
      // grows by a join+agg per iteration and planning cost comes to
      // dominate; checkpointing every other pass keeps the plan bounded
      // while halving the job count (each Spark job runs two iterations'
      // join+agg). The q12 integer rounding makes every iteration's result
      // the same doubles regardless of where the materialization barrier
      // falls. Ranks are node-sized, safe to materialize.
      if (i % 2 == 1 || i == iters - 1) ranks = ranks.localCheckpoint()
    }
    val out = ranks.join(deg, ranks("node") === deg("src"))
      .select(col("node"), col("outdeg"), round(col("rank"), 6).as("rank"))
      // materialize before dropping the caches the lineage leans on
      .localCheckpoint()
    withDeg.unpersist()
    e.unpersist()
    out
  }
}
