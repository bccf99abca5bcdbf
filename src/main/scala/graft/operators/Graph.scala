package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over edge lists. Companion to the connected-
  * components loop in [[Dedup.dedupClusters]]: fixed-round Pregel-style
  * join/agg iterations whose arithmetic is pure int64, so every engine
  * (and every executor count) produces bit-identical ranks.
  */
object Graph {

  /** PageRank (Page et al. 1999) in integer micro-units: ranks are BIGINTs
    * scaled by 10^6 and every step uses floor division, so the result is
    * deterministic across engines and partitionings — no floating-point
    * accumulation order anywhere. The price is ≤ 1e-6 absolute quantization
    * per step, irrelevant for the ranking/weighting uses (domain quality
    * weighting à la CommonCrawl host ranks) this feeds.
    *
    * Shuffle shape per iteration: one join of edges with the rank table on
    * src (both keyed on the node — co-partitioned after the first round) and
    * one groupBy(dst) with map-side partial sums. Nodes and ranks are
    * |V|-sized, never collected; the 1-row node count is the only broadcast.
    * 10 iterations = 10 keyed exchanges — the standard Pregel cost.
    *
    * Overflow guard: rank ≤ 10^6, so rank*weight needs weight ≤ ~9·10^12
    * per edge to stay in int64 — far above any real edge multiplicity; the
    * damped sum is bounded by total mass (10^6) times 100.
    *
    * @param edges  (src, dst, weight>0) directed multigraph, weights long.
    * @return (node, rank_micro) after `iters` rounds from the uniform start.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
               iters: Int = 10, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters out of range")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct=$dampingPct")
    import org.apache.spark.storage.StorageLevel
    // pin the edge projection AT ENTRY, before nodes/outw/ew derive from it:
    // those three subtrees (plus both union arms inside `nodes`) would each
    // re-execute the caller's upstream pipeline — which may be a whole LSH
    // candidate computation (q120: bucket self-join + distinct + two label
    // joins re-ran 6-8x per pagerank call before this pin). The count()
    // materializes the cache so every derivation below reads it. Same cache
    // contract as bucketPairs: callers running many graphs reclaim via
    // clearCache().
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outw = e.groupBy("src").agg(sum(col("w")).as("outw"))
    // ew is referenced every iteration: pin it too so the per-round join
    // reads a materialized table instead of re-joining e with outw
    val ew = e.join(outw, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val n1 = nodes.agg(count(lit(1)).as("n"))
    val base = nodes.crossJoin(broadcast(n1)).persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = base.select(col("node"), expr("1000000L div n").as("r"))
    for (i <- 1 to iters) {
      val s = ew.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("(r * w) div outw").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = base.join(s, base("node") === s("dst"), "left")
        .select(col("node"),
          (expr(s"(1000000L * ${100 - dampingPct}) div (100L * n)")
            + expr(s"(coalesce(s, 0L) * $dampingPct) div 100")).as("r"))
      // lineage hygiene: the rank plan deepens by one join+agg per round, so
      // analysis/optimization cost grows quadratically with iters on an
      // unrolled plan. Truncate every 20 rounds (localCheckpoint keeps the
      // data on executors — no HDFS dir needed); at the default 10 rounds
      // this never fires, at the iters=100 cap it bounds plan depth at 20.
      if (i % 20 == 0 && i < iters) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
