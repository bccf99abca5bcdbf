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
