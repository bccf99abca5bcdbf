package graft

import org.apache.spark.sql.functions._

/** The bench's one-time-stage contamination sentinel (r8 verdict finding
  * #1): the shared-artifact build runs ONCE per sweep, so the per-query
  * min/median spread heuristic cannot witness interference against it —
  * its only witness is the 1-min loadavg stamped at build start. Also
  * pins the r8 ask #7 fix: q151/q153's registered forms run with their
  * assignment subtree PINNED, so the banding/gate self-joins derive it
  * once instead of once per join side. */
class BenchOneTimeSpec extends SparkSpec {

  test("pure flag: a contaminated one-time build trips, an idle one does not") {
    // the r8 evidence pair: the same commit's one-time stage read 7.25 s at
    // loadavg 1.76 (idle) and 36.97 s at 6.02 (driver box) with n_suspect=0
    assert(Bench.oneTimeSuspects(Map(
      "cluster_labels:/idle" -> 1.76,
      "cluster_labels:/busy" -> 6.02)) == Seq("cluster_labels:/busy"))
    assert(Bench.oneTimeSuspects(Map("cluster_labels:/idle" -> 1.2)).isEmpty)
  }

  test("the REAL shared-artifact build stamps its start loadavg (simulated busy box)") {
    // a symlink alias gives the artifact cache a COLD key, so the genuine
    // build path runs here even if another suite already built sf0.001's
    // labels in this JVM
    val alias = java.nio.file.Files.createTempDirectory("bench_ot").toString + "/sf"
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(alias), java.nio.file.Paths.get("/root/testdata/sf0.001"))
    val orig = SparkEntry.loadAvg1Reader
    try {
      SparkEntry.loadAvg1Reader = () => 9.9 // the contaminated box
      assert(SparkEntry.queries("q118_cluster_sizes")(spark, alias).count() > 0)
      assert(SparkEntry.oneTimeCosts.keySet.contains(s"cluster_labels:$alias"),
        "the build must record its wall cost")
      assert(SparkEntry.oneTimeLoadAvgs.get(s"cluster_labels:$alias").contains(9.9),
        "the build must stamp the loadavg its window started under")
      assert(Bench.oneTimeSuspects(SparkEntry.oneTimeLoadAvgs)
        .contains(s"cluster_labels:$alias"),
        "a 9.9-loadavg build must be flagged one_time_suspect")
    } finally SparkEntry.loadAvg1Reader = orig
  }

  test("pure requeue decision: spread or sweep-start load trips a clean re-run; floor queries never requeue on load alone") {
    // r9 verdict ask #5: the committed artifact summed load-inflated
    // medians into `value` (q90 6.72 s committed vs 2.62 s idle at the
    // same HEAD) — a flagged query now earns ONE post-sweep re-run.
    // The load witness is the SWEEP's pre-warmup loadavg (foreign by
    // construction), never a per-query mid-sweep sample: at local[32] the
    // sweep saturates the box itself — measured 110/159 queries "over
    // threshold" from the bench's own work on an idle box.
    // spread arm: median/min beyond the ambient band
    assert(Bench.shouldRequeue(min = 1.0, median = 3.0, sweepStartLoad = 1.0, runs = 3))
    // load arm: the sweep STARTED under foreign contention, even with a
    // tight spread (back-to-back runs land in the same busy window)
    assert(Bench.shouldRequeue(min = 2.0, median = 2.1, sweepStartLoad = 4.0, runs = 3))
    // floor-dominated under load: no signal worth a re-run — and the guard
    // that keeps a busy box from requeueing the whole 111-floor-query sweep
    assert(!Bench.shouldRequeue(min = 0.3, median = 0.31, sweepStartLoad = 6.0, runs = 3))
    // idle + tight: clean
    assert(!Bench.shouldRequeue(min = 1.0, median = 1.2, sweepStartLoad = 1.0, runs = 3))
    // single-run sweeps have no spread witness; the load arm still works
    assert(!Bench.shouldRequeue(min = 1.0, median = 1.0, sweepStartLoad = 1.0, runs = 1))
    assert(Bench.shouldRequeue(min = 1.0, median = 1.0, sweepStartLoad = 4.0, runs = 1))
    // sub-50ms jitter never trips the spread arm
    assert(!Bench.shouldRequeue(min = 0.01, median = 0.04, sweepStartLoad = 1.0, runs = 3))
  }

  test("q153/q151 registered forms are PINNED: one assignment derivation feeds the self-join") {
    // unpinned, the gate/banding self-join re-derives the assignment from
    // the embeddings scan on BOTH sides — distinct FileScan lines (distinct
    // expression ids) would show 2+ source scans. Pinned (localCheckpoint),
    // q153 reads the source zero times at query time and q151 exactly once
    // (its stored side; the batch/banded side is checkpointed).
    def embScans(q: String): Int = {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect() // finalize AQE
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("FileScan") && l.contains("embeddings"))
        .map(l => l.substring(l.indexOf("FileScan"))).toSeq.distinct.size
    }
    assert(embScans("q153_banded_repair") == 0,
      "q153 must run entirely from its pinned assignment")
    assert(embScans("q151_vector_ingest_gate") <= 1,
      "q151's only source scan is the stored side")
  }
}
