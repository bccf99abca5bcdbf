package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental LSH dedup (q85): a new batch probes the stored corpus index
  * without recomputing corpus signatures — the per-batch shape of 100 TB
  * ingest. Correctness is pinned against the batch-mode candidate set on
  * real testdata. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental(batch vs index) + within-corpus == full-corpus candidates") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val index = Dedup.lshBands(corpus, "doc_id", "text")
    val incr = pairSet(Dedup.incrementalLshCandidates(batch, "doc_id", "text", index))
    val withinCorpus = pairSet(Dedup.minhashLshCandidates(corpus, "doc_id", "text"))
    val full = pairSet(Dedup.minhashLshCandidates(docs, "doc_id", "text"))
    assert(incr.union(withinCorpus) == full)
    // and the incremental set touches the batch on every pair
    assert(incr.forall { case (a, b) => a % 10 == 0 || b % 10 == 0 })
    assert(incr.intersect(withinCorpus).isEmpty)
  }

  test("re-ingesting an already-indexed doc emits no self-pair") {
    val index = Dedup.lshBands(docs, "doc_id", "text")
    val reingest = docs.limit(20)
    val got = Dedup.incrementalLshCandidates(reingest, "doc_id", "text", index)
    assert(got.filter(col("doc_a") === col("doc_b")).count() == 0)
  }

  test("incrementalKeep: corpus near-dups drop, within-batch keeps the min id") {
    // corpus doc 100 == batch doc 10; batch docs 20/21 are near-dups of each
    // other only; batch doc 30 is unique
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),
      (20L, "completely different content about spark query engines and shuffles"),
      (21L, "completely different content about spark query engines and shuffles"),
      (30L, "unrelated third topic with its own vocabulary entirely elsewhere")
    ).toDF("doc_id", "text")
    val index = Dedup.lshBands(corpus, "doc_id", "text")
    val kept = Dedup.incrementalKeep(batch, "doc_id", "text", index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(20L, 30L)) // 10 lost to corpus, 21 lost to 20, 20/30 kept
  }

  test("incrementalKeep: re-ingest overlap cannot shield a batch near-dup (corpus always wins)") {
    // id 5 is in BOTH the index and the batch; batch doc 3 near-dups it.
    // The old normalized-pair logic saw (3, 5) with both ids batch-side and
    // skipped the corpus-partner test — 3 survived despite near-dupping a
    // CORPUS row. Provenance-preserving probe: 3 drops (its partner is a
    // corpus row), and the re-ingested 5 drops too (min-partner vs batch
    // doc 3 — and it is already indexed, so not re-appending it is the
    // idempotent outcome). Nothing survives.
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq((5L, base)).toDF("doc_id", "text")
    val batch = Seq((3L, base), (5L, base)).toDF("doc_id", "text")
    val index = Dedup.lshBands(corpus, "doc_id", "text")
    val kept = Dedup.incrementalKeep(batch, "doc_id", "text", index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set.empty[Long], s"got $kept")
  }

  test("indexDedupStream runs the batch core per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val index = Dedup.lshBands(corpus, "doc_id", "text")
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val survived = scala.collection.mutable.Set[Long]()
    val q = Streams.indexDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", index) { kept =>
      survived ++= kept.select("doc_id").collect().map(_.getLong(0))
    }.start()
    try {
      input.addData((10L, base), (30L, "unrelated third topic with its own vocabulary"))
      q.processAllAvailable()
      assert(survived.toSet == Set(30L))
    } finally q.stop()
  }

  test("reconcileHammingKeeps: a 3-batch chain straddle resolves to the full-batch keeps") {
    // chain A(1,fp 0) ~ B(2,fp 3) ~ C(3,fp 15), A !~ C at maxHamming=2:
    //   batch1 {1}: kept, indexed
    //   batch2 {2}: near-dups indexed 1 -> dropped, NEVER indexed
    //   batch3 {3}: probes index {1}, hamming(0,15)=4 > 2 -> kept (the greedy
    //               divergence: the chain's middle link is missing)
    // full-batch: pairs (1,2),(2,3) -> one component {1,2,3} -> keep {1}
    val mh = 2; val bits = 64
    def fps(rows: (Long, Long)*) = rows.toSeq.toDF("media_id", "dhash")
    val b1 = fps(1L -> 0L); val b2 = fps(2L -> 3L); val b3 = fps(3L -> 15L)
    var index = Dedup.hammingBandIndex(
      fps(), "media_id", "dhash", mh, bits)
    var kept = Seq.empty[(Long, Long)]
    Seq(b1, b2, b3).foreach { b =>
      val k = Dedup.incrementalHammingKeep(b, "media_id", "dhash", index, mh, bits)
      val kr = k.collect().map(r => (r.getLong(0), r.getLong(1)))
      kept ++= kr
      index = index.unionByName(
        Dedup.hammingBandIndex(fps(kr.toIndexedSeq: _*), "media_id", "dhash", mh, bits))
    }
    assert(kept.map(_._1).toSet === Set(1L, 3L), "greedy keeps diverge (chain straddle)")

    val archive = b1.unionByName(b2).unionByName(b3) // kept AND dropped rows
    val r = Dedup.reconcileHammingKeeps(archive, "media_id", "dhash",
      fps(kept.toIndexedSeq: _*).select("media_id"), mh, bits)
    assert(r.repairedKeeps.collect().map(_.getLong(0)).toSet === Set(1L))
    assert(r.drops.collect().map(_.getLong(0)).toSet === Set(3L))
    assert(r.resurrections.count() === 0)
    // pinned equivalence: repaired == the full-batch pass over the archive
    val fullLosers = Dedup.resolveClusters(
      Dedup.hammingNearDupPairs(archive, "media_id", "dhash", mh, bits),
      "doc_a", "doc_b").filter(col("id") =!= col("cluster_id"))
    val fullKeeps = archive.join(
      fullLosers.withColumnRenamed("id", "media_id"), Seq("media_id"), "left_anti")
    assert(r.repairedKeeps.collect().map(_.getLong(0)).toSet ===
      fullKeeps.select("media_id").collect().map(_.getLong(0)).toSet)
  }

  test("reconcileLshKeeps: corpus-wins keeps a larger id; reconcile resurrects the minimum") {
    // batch1 ingests id 5; batch2's id 1 (same text) drops because the
    // corpus always wins — greedy keeps {5}, but the full-batch,
    // order-independent semantics keep the cluster minimum {1}
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val b1 = Seq((5L, base)).toDF("doc_id", "text")
    val b2 = Seq((1L, base)).toDF("doc_id", "text")
    val index = Dedup.lshBands(b1, "doc_id", "text")
    val kept2 = Dedup.incrementalKeep(b2, "doc_id", "text", index)
    assert(kept2.count() === 0, "greedy: corpus wins, 1 drops")
    val archive = b1.unionByName(b2)
    val r = Dedup.reconcileLshKeeps(archive, "doc_id", "text",
      Seq(5L).toDF("doc_id"))
    assert(r.repairedKeeps.collect().map(_.getLong(0)).toSet === Set(1L))
    assert(r.drops.collect().map(_.getLong(0)).toSet === Set(5L))
    assert(r.resurrections.collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("reconcile on real testdata: repair algebra holds and the repaired set is a fixpoint") {
    val empty = Dedup.lshBands(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text")
    val kept = Dedup.incrementalKeep(docs, "doc_id", "text", empty)
      .select("doc_id")
    val r = Dedup.reconcileLshKeeps(docs, "doc_id", "text", kept)
    // repaired = (kept \ drops) ∪ resurrections, with the two diff legs disjoint
    val keptSet = kept.collect().map(_.getLong(0)).toSet
    val drops = r.drops.collect().map(_.getLong(0)).toSet
    val res = r.resurrections.collect().map(_.getLong(0)).toSet
    val repaired = r.repairedKeeps.collect().map(_.getLong(0)).toSet
    assert(drops.subsetOf(keptSet) && res.intersect(keptSet).isEmpty)
    assert(repaired === (keptSet -- drops) ++ res)
    // applying the repair is idempotent: reconciling the repaired set again
    // finds nothing left to fix
    val r2 = Dedup.reconcileLshKeeps(docs, "doc_id", "text", r.repairedKeeps)
    assert(r2.drops.count() === 0 && r2.resurrections.count() === 0)
  }

  test("indexDedupStream: a redelivered batch re-filters identically; no cache pin leaks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val index = Dedup.lshBands(corpus, "doc_id", "text")
    index.count() // settle any lazy state before sampling the cache
    val cachedBefore = !spark.sharedState.cacheManager.isEmpty
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val perBatch = Seq.newBuilder[Set[Long]]
    val q = Streams.indexDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", index) { kept =>
      perBatch += kept.select("doc_id").collect().map(_.getLong(0)).toSet
    }.start()
    try {
      val batch = Seq((10L, base), (30L, "unrelated third topic with its own vocabulary"))
      input.addData(batch: _*)
      q.processAllAvailable()
      input.addData(batch: _*) // at-least-once redelivery of the SAME rows
      q.processAllAvailable()
      // replays re-filter identically because the index only grows (and here
      // did not grow at all between deliveries)
      assert(perBatch.result() === Seq(Set(30L), Set(30L)))
      // the per-batch band pin must be released by the stream wrapper: a
      // leak here compounds per micro-batch for the lifetime of the job
      if (!cachedBefore)
        assert(spark.sharedState.cacheManager.isEmpty,
          "indexDedupStream leaked its batch band pin")
    } finally q.stop()
  }

  test("plan: the batch side broadcasts; the index is never shuffled") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val index = Dedup.lshBands(corpus, "doc_id", "text")
    val p = Dedup.incrementalLshCandidates(batch, "doc_id", "text", index)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
