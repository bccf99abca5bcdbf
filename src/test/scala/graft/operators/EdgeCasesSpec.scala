package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: empty tables, single rows, all-duplicate
  * corpora — the shapes that break naive implementations at partition
  * boundaries. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc = Seq((1L, "only one document here")).toDF("doc_id", "text")

  test("dedup operators on empty and singleton corpora") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashLshCandidates(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 2, 0.5).count() == 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(oneDoc, "doc_id", "text", 2, 0.5).count() == 0)
    assert(Dedup.minhashLshCandidates(oneDoc, "doc_id", "text").count() == 0)
    assert(Dedup.simhashNearDupPairs(emptyDocs, "doc_id", "text", 3).count() == 0)
    assert(Dedup.simhashNearDupPairs(oneDoc, "doc_id", "text", 3).count() == 0)
    // no near-dup pairs -> empty cluster table, not an NPE
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.resolveClusters(noPairs, "doc_a", "doc_b").count() == 0)
  }

  test("hamming banding: single full-width band (maxHamming=0, bits=64) stays lossless") {
    // the 1L << 64 wrap edge: a 64-bit band needs the explicit all-ones
    // mask. Driven on raw 64-bit fingerprints (dHash's domain) — simhash
    // itself now rejects bits > 32 (md5Prefix32 carries 32 hash bits)
    val fps = Seq(
      (1L, 0x7fffffff_ffffffffL),
      (2L, 0x7fffffff_ffffffffL), // exact dup -> hamming 0
      (3L, 0x00000000_000000ffL)).toDF("doc_id", "fp")
    val out = Dedup.hammingNearDupPairs(fps, "doc_id", "fp", maxHamming = 0, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 0L))) // a 64-bit band mask must not collapse buckets
  }

  test("all-identical corpus: every pair is a candidate with jaccard 1.0") {
    val dup = (1L to 5L).map(i => (i, "same text every time here")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(dup, "doc_id", "text", 2, 0.99)
    assert(pairs.count() == 10) // C(5,2)
    assert(pairs.select("jaccard").as[Double].collect().forall(_ == 1.0))
    val g = Dedup.exactGroups(dup, "doc_id", "text").head()
    assert(g.getAs[Long]("dup_count") == 5L && g.getAs[Long]("keep_id") == 1L)
  }

  test("embedding ops with zero vectors and empty input") {
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDupPairs(emptyEmb, "vec_id", "embedding", 0.5).count() == 0)
    val withZero = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(withZero, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L))) // zero-norm vector never matches
  }

  test("asofJoin with empty right side leaves all left rows unmatched") {
    val left = Seq((1, 10L, "x")).toDF("k", "ts", "tag")
    val right = Seq.empty[(Int, Long, Double)].toDF("k", "ts", "px")
    val out = Relational.asofJoin(left, right, "k", "ts", "ts", Seq("px"))
    assert(out.count() == 1 && out.head().isNullAt(out.columns.indexOf("asof_px")))
  }

  test("groupConcat / topN / keep-last on empty input") {
    val empty = Seq.empty[(Int, String)].toDF("k", "v")
    assert(empty.groupBy("k").agg(Relational.groupConcatDistinct(col("v"))).count() == 0)
    assert(Relational.topNPerKey(empty, Seq("k"), Seq(col("v")), 3).count() == 0)
    assert(Relational.dedupKeepLast(empty, Seq("k"), Seq(col("v"))).count() == 0)
  }

  test("lookupOrCreate from an empty dim starts ids at 1") {
    val dim = Seq.empty[(Int, String)].toDF("id", "name")
    val out = Relational.lookupOrCreate(dim, "id", "name", Seq("b", "a").toDF("name"))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a"), (2, "b")))
  }

  test("simhash rejects bits > 32 loudly (md5Prefix32 carries 32 hash bits)") {
    // a 64-bit request used to zero bits 32..63 of every fingerprint and
    // degenerate the high hamming bands into all-docs buckets
    intercept[IllegalArgumentException](
      Dedup.simhash(oneDoc, "doc_id", "text", bits = 64))
    assert(Dedup.simhash(oneDoc, "doc_id", "text", bits = 32).count() == 1)
  }

  test("resolveClusters rejects non-numeric ids loudly (decimal convergence sum)") {
    // string ids cast to NULL in the convergence sum and every doc silently
    // became its own cluster
    val pairs = Seq(("urlA", "urlB")).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](
      Dedup.resolveClusters(pairs, "doc_a", "doc_b"))
  }

  test("weightedSample: weights below the decimal quantum keep ~targetK, not everything") {
    // 1e-7 weights truncated to zero at the old DECIMAL(38,6) scale, zeroing
    // W; the null-skipping least() then kept EVERY row
    val docs = (1L to 1000L).map(i => (i, 1e-7)).toDF("doc_id", "w")
    val kept = Sampling.weightedSample(docs, "doc_id", col("w"), targetK = 100).count()
    assert(kept > 0 && kept < 300, s"expected ~100 of 1000, got $kept")
  }
}
