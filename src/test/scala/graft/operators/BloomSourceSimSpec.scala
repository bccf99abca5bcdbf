package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the q123/q124/q125 wave: Bloom decontamination, multi-probe
  * rerank, per-source mergeable MinHash. */
class BloomSourceSimSpec extends SparkSpec {
  import spark.implicits._

  // doc 10 (eval: id % 10 == 0) shares its full text with train doc 11;
  // train doc 12 overlaps nothing with the eval split
  private lazy val docs = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"),
    (11L, "alpha beta gamma delta epsilon zeta"),
    (12L, "one two three four five six seven eight"),
    (13L, "alpha beta unrelated tail words here")
  ).toDF("doc_id", "text")

  test("bloomContaminationReport: zero false negatives on an exact eval copy") {
    val r = Dedup.bloomContaminationReport(docs, "doc_id", "text",
      evalMod = 10, numHashes = 3, words = 8192)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    // only train docs appear
    assert(r.keySet == Set(11L, 12L, 13L))
    // doc 11 == eval doc 10: every shingle must hit (Bloom never false-negatives)
    val (n11, h11, c11) = r(11L)
    assert(n11 == 5 && h11 == 5 && c11)
    // doc 13 shares exactly the "alpha beta" bigram -> at least that one hits
    val (n13, h13, c13) = r(13L)
    assert(n13 == 5 && h13 >= 1 && c13)
    // hits never exceed shingle count
    assert(r.values.forall { case (n, h, _) => h >= 0 && h <= n })
  }

  test("bloomContaminationReport: saturated bitmap flags everything (fp ceiling)") {
    // words = 1 -> 63 bits total; a 200-word eval doc sets ~600 positions,
    // saturating the filter so every train shingle reads as present — the
    // documented false-positive trade at fill -> 1
    val sat = Seq(
      (20L, (0 until 200).map(i => s"w$i").mkString(" ")),
      (1L, "zz0 zz1 zz2 zz3 zz4 zz5"),
      (2L, "yy0 yy1 yy2 yy3 yy4 yy5")
    ).toDF("doc_id", "text")
    val r = Dedup.bloomContaminationReport(sat, "doc_id", "text",
      evalMod = 10, numHashes = 3, words = 1)
    assert(r.count() == 2 && r.filter(!col("contaminated")).count() == 0)
  }

  private lazy val emb = {
    val data = (0L to 19L).map(i =>
      (i, (0 until 8).map(d => ((i * 13 + d * 7) % 17).toFloat - 8f)))
    data.toDF("vec_id", "embedding")
  }

  test("multiProbeTopK: maxFlip=numPlanes equals brute force; hamming bounded") {
    val qv = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val brute = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      typedLit(qv), k = 6).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
      probeId = 0L, numPlanes = 4, dims = 8, maxFlip = 4, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(full == brute)
    val probed = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
      probeId = 0L, numPlanes = 4, dims = 8, maxFlip = 1, k = 6).collect()
    assert(probed.forall(_.getLong(1) <= 1L))
    // maxFlip=0 candidates sit in the probe's own bucket (hamming 0)
    val own = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
      probeId = 0L, numPlanes = 4, dims = 8, maxFlip = 0, k = 6).collect()
    assert(own.forall(_.getLong(1) == 0L))
  }

  test("sourceMinhashSimilarity: identical sources agree on every slot; matrix is upper-triangular") {
    val d = Seq(
      (1L, "srcA", "the quick brown fox jumps over the lazy dog"),
      (2L, "srcA", "pack my box with five dozen liquor jugs"),
      (3L, "srcB", "the quick brown fox jumps over the lazy dog"),
      (4L, "srcB", "pack my box with five dozen liquor jugs"),
      (5L, "srcC", "completely disjoint vocabulary about spark shuffles")
    ).toDF("doc_id", "source", "text")
    val m = Dedup.sourceMinhashSimilarity(d, "source", "text", numHashes = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m.keySet == Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    // A and B hold the same shingle set -> all 8 slots agree, est = 1.0
    assert(m(("srcA", "srcB")) == (8L, 1.0))
    // C's vocabulary is disjoint -> strictly less agreement than identity
    assert(m(("srcA", "srcC"))._1 < 8L)
  }

  test("clusterSafeSplit: cluster members share a split; singletons match plain hashSplit") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the bank"),
      (7L, "the quick brown fox jumps over the lazy dog near the bank"),
      (42L, "completely unrelated content about spark query engines")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshCandidates(d, "doc_id", "text")
    val cuts = Seq("train" -> 50, "val" -> 30, "test" -> 20)
    val split = Sampling.clusterSafeSplit(d, "doc_id", pairs, "doc_a", "doc_b", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1, 2, 7 are one dup cluster -> identical split assignment
    assert(split(1L) == split(2L) && split(2L) == split(7L))
    // the singleton splits exactly as plain hashSplit on its own id
    val plain = d.filter(col("doc_id") === 42L)
      .select(Sampling.hashSplit(col("doc_id"), cuts)).head().getString(0)
    assert(split(42L) == plain)
    // no near-dup pair may straddle a split boundary (the q109 invariant)
    val straddle = pairs.collect().count { r =>
      split(r.getLong(0)) != split(r.getLong(1)) }
    assert(straddle == 0)
  }

  test("minhashAgreementCurve: k+1 rows, monotone, anchored at the candidate count") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the bank"),
      (3L, "the quick brown fox jumps over the lazy cat near the bank"),
      (4L, "completely unrelated content about spark query engines")
    ).toDF("doc_id", "text")
    val curve = Dedup.minhashAgreementCurve(d, "doc_id", "text", numHashes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(curve.keySet == (0L to 8L).toSet)
    // survival is non-increasing in the threshold
    (0L until 8L).foreach(t => assert(curve(t) >= curve(t + 1)))
    // threshold 0 keeps every candidate pair
    val nCand = Dedup.minhashLshCandidates(d, "doc_id", "text").count()
    assert(curve(0L) == nCand)
    // the exact-dup pair agrees on every slot
    assert(curve(8L) >= 1L)
  }

  test("sourceMinhashSimilarity: signatures merge (union source == min of parts)") {
    // source "ab" holds the union of a's and b's docs; its pairwise
    // agreement with a merged-by-construction twin must be total
    val d = Seq(
      (1L, "a", "alpha beta gamma delta"),
      (2L, "b", "epsilon zeta eta theta"),
      (3L, "ab", "alpha beta gamma delta"),
      (4L, "ab", "epsilon zeta eta theta")
    ).toDF("doc_id", "source", "text")
    val m = Dedup.sourceMinhashSimilarity(d, "source", "text", numHashes = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // ab vs a and ab vs b: ab's slots are min(a_slots, b_slots), so every
    // slot where a (resp. b) holds the min agrees; together they cover all 8
    assert(m(("a", "ab")) + m(("ab", "b")) >= 8L)
  }
}
