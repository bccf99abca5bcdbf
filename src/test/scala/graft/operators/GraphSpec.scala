package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int = 5) =
    Graph.pagerank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pagerank: 2-cycle fixed point is the uniform 500000/500000") {
    // symmetric graph: the uniform start is already the fixed point, and the
    // integer update preserves it exactly (75000 + 425000 = 500000)
    val out = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 7)
    assert(out == Map("a" -> 500000L, "b" -> 500000L))
  }

  test("pagerank: strongly connected graph conserves mass up to floor leak") {
    // triangle + a chord; no dangling nodes, so the only loss is the floor
    // quantization (< 1 micro-unit per node per term, a handful total)
    val out = ranks(Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L),
      ("a", "c", 1L)), iters = 10)
    val total = out.values.sum
    assert(total <= 1000000L && total >= 1000000L - 100L, s"total=$total")
  }

  test("pagerank: directed star concentrates rank on the hub") {
    val leaves = (1 to 8).map(i => (s"leaf$i", "hub", 1L))
    val out = ranks(leaves)
    assert(out("hub") > out("leaf1") * 4, out.toString)
    // leaves receive no links: each sits at the damping floor (identical)
    assert((1 to 8).map(i => out(s"leaf$i")).toSet.size == 1)
  }

  test("pagerank: weight-proportional split of a source's rank") {
    // a sends 3/4 of its mass to b, 1/4 to c; b and c are otherwise alike
    // (both return all mass to a), so b must outrank c strictly
    val out = ranks(Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)), iters = 10)
    assert(out("b") > out("c"), out.toString)
  }

  test("pagerank: bit-identical across partitionings (integer arithmetic)") {
    val edges = (0 until 40).map(i =>
      (s"n${i % 11}", s"n${(i * 7 + 3) % 11}", (i % 5 + 1).toLong))
    val df = edges.toDF("src", "dst", "w")
    val a = Graph.pagerank(df, "src", "dst", "w", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pagerank(df.repartition(13), "src", "dst", "w", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("pagerank: checkpoint truncation keeps plan depth bounded at iters=50") {
    // without the every-20-rounds localCheckpoint the logical plan deepens by
    // one join+agg per round and analysis cost grows quadratically with
    // iters; with it, the final plan holds at most the LAST <20 rounds of
    // lineage. Pin both the result (checkpoint must not change values vs the
    // unrolled form) and the plan depth.
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 2L), ("a", "c", 1L))
      .toDF("src", "dst", "w")
    val out = Graph.pagerank(edges, "src", "dst", "w", iters = 50)
    val joins = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    // <20 un-truncated rounds x 2 joins/round + slack; the unrolled form
    // would carry ~100 joins
    assert(joins <= 45, s"plan carries $joins joins — checkpoint not firing?")
    val total = out.collect().map(_.getLong(1)).sum
    assert(total <= 1000000L && total >= 1000000L - 100L, s"total=$total")
  }

  test("pagerank executes its edge input exactly once (entry pin)") {
    // the edge frame may sit on top of a whole LSH candidate pipeline
    // (q120's shape): pagerank derives nodes/outw/ew from it across FIVE
    // subtrees, so without the entry pin the upstream would re-execute 6-8x.
    // An accumulator inside the input counts upstream row-processings: with
    // the pin it must equal the row count exactly — one execution.
    val acc = spark.sparkContext.longAccumulator("edge-scans")
    val raw = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 2L))
      .toDF("src", "dst", "w")
      .as[(String, String, Long)]
      .mapPartitions(_.map { r => acc.add(1); r })
      .toDF("src", "dst", "w")
    val out = Graph.pagerank(raw, "src", "dst", "w", iters = 3)
    out.collect()
    assert(acc.value === 3L, s"edge input executed ${acc.value / 3.0}x")
  }
}
