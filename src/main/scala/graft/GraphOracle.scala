package graft

/** Generated DuckDB oracle SQL for the graph queries. The iterative ranks
  * are unrolled into one CTE per round — possible only because
  * [[graft.operators.Graph.pagerank]] is integer-exact (BIGINT micro-units,
  * floor division), so the oracle needs no float tolerance anywhere.
  */
object GraphOracle {

  /** PageRank over `edgesSql`(src VARCHAR, dst VARCHAR, w BIGINT), unrolled
    * to `iters` rounds. Mirrors Graph.pagerank step-for-step: uniform start
    * 10^6 // n, per-edge contribution (r*w) // outw, damped update
    * (10^6 * (100-d)) // (100*n) + (sum * d) // 100 — all BIGINT floor
    * divisions (operands are non-negative, so DuckDB's `//` and Spark's
    * `div` agree).
    */
  def pagerankSql(edgesSql: String, iters: Int, dampingPct: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""s$i AS (
      SELECT e.dst, CAST(SUM((r.r * e.w) // o.outw) AS BIGINT) AS s
      FROM e JOIN outw o ON o.src = e.src JOIN r${i - 1} r ON r.node = e.src
      GROUP BY e.dst),
    r$i AS (
      SELECT nodes.node,
             (1000000 * ${100 - dampingPct}) // (100 * nn.n)
               + (COALESCE(s.s, 0) * $dampingPct) // 100 AS r
      FROM nodes CROSS JOIN nn LEFT JOIN s$i s ON s.dst = nodes.node)"""
    }.mkString(",\n    ")
    s"""
    WITH e AS ($edgesSql),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, 1000000 // nn.n AS r FROM nodes CROSS JOIN nn),
    $steps
    SELECT node, CAST(r AS BIGINT) AS rank_micro FROM r$iters"""
  }

  /** The q116 edge list: the supplier→part shipment graph from lineitem,
    * weight = quantity (namespaced node ids keep the two key spaces apart).
    */
  def lineitemEdgesSql: String =
    """SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
              'p' || CAST(l_partkey AS VARCHAR) AS dst,
              CAST(l_quantity AS BIGINT) AS w
       FROM lineitem"""
}
