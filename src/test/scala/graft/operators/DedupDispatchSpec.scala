package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-guard dispatch tests: every gate in the adaptive Jaccard / embedding
  * near-dup strategy choice is forced and the strategies are asserted
  * equivalent (the point of adaptive dispatch: identical answers, different
  * physical plans).
  */
class DedupDispatchSpec extends SparkSpec {
  import spark.implicits._

  // varied-overlap corpus: dup pair, near-dup, partial overlaps, disjoint doc
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "alpha beta gamma delta epsilon eta"),
    (4L, "alpha beta gamma other words here now"),
    (5L, "totally unrelated text about engines and planes"),
    (6L, "beta gamma delta epsilon zeta alpha")
  ).toDF("doc_id", "text")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("bitmap and prefix-filtered inverted index agree at multiple thresholds") {
    for (t <- Seq(0.0, 0.1, 0.3, 0.5, 0.8, 1.0)) {
      val bitmap = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, t))
      val inverted = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, t,
        maxBitmapVocab = 1)) // vocab gate -> inverted index
      assert(bitmap == inverted, s"threshold $t: bitmap=$bitmap inverted=$inverted")
    }
  }

  test("document-count gate routes a small-vocab corpus off the bitmap path") {
    val t = 0.3
    val viaDocsGate = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, t,
      maxBitmapDocs = 2) // 6 docs > 2 -> must take the inverted index
    // the inverted-index plan never touches the native all-pairs exec or the
    // docBits broadcast scan
    val planStr = viaDocsGate.queryExecution.optimizedPlan.toString
    assert(!planStr.contains("AllPairsJaccard"), planStr.take(500))
    assert(pairSet(viaDocsGate) == pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, t)))
  }

  test("byte-estimate gate routes off the bitmap path") {
    val t = 0.3
    val viaBytesGate = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, t,
      maxBitmapBytes = 64) // 6 docs never fit 64 bytes of bitsets
    assert(!viaBytesGate.queryExecution.optimizedPlan.toString.contains("AllPairsJaccard"))
    assert(pairSet(viaBytesGate) == pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, t)))
  }

  test("prefix filter drops hot shingles from the index but loses no pairs") {
    // every doc shares the hot bigram "x x"; only true near-dups qualify
    val hot = Seq(
      (1L, "x x a b c d e"),
      (2L, "x x a b c d f"),
      (3L, "x x p q r s t"),
      (4L, "x x p q r s u"),
      (5L, "x x m n o w z")
    ).toDF("doc_id", "text")
    val t = 0.5
    val inverted = pairSet(Dedup.ngramJaccardPairs(hot, "doc_id", "text", 2, t,
      maxBitmapVocab = 1))
    val bitmap = pairSet(Dedup.ngramJaccardPairs(hot, "doc_id", "text", 2, t))
    assert(inverted == bitmap)
    assert(inverted.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))
  }

  test("inverted index reproduces the oracle-verified bitmap result on real testdata") {
    // the driver corpus always dispatches to the bitmap path (vocab ~916),
    // so force the prefix-filtered inverted index over the SAME data and
    // assert it reproduces the hash-verified q30 result exactly
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bitmap = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2))
    val inverted = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2,
      maxBitmapVocab = 1))
    assert(bitmap.nonEmpty && bitmap == inverted)
  }

  private lazy val vecs = {
    val mk = (seed: Int) => Array.tabulate(8)(i => (seed * 7 + i).toFloat / 10f)
    val near = mk(1).clone(); near(0) += 0.001f
    Seq((0L, mk(1).toSeq), (1L, near.toSeq), (2L, mk(5).toSeq), (3L, mk(9).toSeq))
      .toDF("vec_id", "embedding")
  }

  test("containment bitmap and shingle-join paths agree; gates route between them") {
    val corpus = docs.filter(col("doc_id") =!= 2L)
    val probe = docs.filter(col("doc_id") === 2L || col("doc_id") === 5L)
    for (t <- Seq(0.0, 0.2, 0.5, 1.0)) {
      val bitmap = pairSet(Dedup.containmentPairs(corpus, probe, "doc_id", "text", 2, t))
      val joined = pairSet(Dedup.containmentPairs(corpus, probe, "doc_id", "text", 2, t,
        maxBitmapVocab = 0)) // gate forces the shingle-join path
      assert(bitmap == joined, s"threshold $t")
      assert(t > 0.5 || bitmap.nonEmpty, s"threshold $t produced no pairs")
    }
    // the bitmap path really is a broadcast pair scan, not a shingle join
    val plan = Dedup.containmentPairs(corpus, probe, "doc_id", "text", 2, 0.2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("containment agrees across paths on real testdata (q53 shape)") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = real.filter(col("doc_id") % 10 =!= 0)
    val probe = real.filter(col("doc_id") % 10 === 0)
    val bitmap = pairSet(Dedup.containmentPairs(corpus, probe, "doc_id", "text", 2, 0.2))
    val joined = pairSet(Dedup.containmentPairs(corpus, probe, "doc_id", "text", 2, 0.2,
      maxBitmapVocab = 0))
    assert(bitmap == joined && bitmap.nonEmpty)
  }

  test("embedding brute-force gate: beyond-cap input REFUSES, naming the scale paths") {
    val inCap = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.9)
    assert(pairSet(inCap).map(p => (p._1, p._2)).contains((0L, 1L)))
    // beyond the gate there is no silent cartesian fallback — the call fails
    // loudly (knnJoin's requireBroadcastable idiom) and points at the
    // sub-quadratic alternatives
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.9,
        maxBruteForceRows = 2) // 4 rows > 2
    }
    assert(ex.getMessage.contains("lshNearDupPairs"), ex.getMessage)
    assert(ex.getMessage.contains("semanticDedup"), ex.getMessage)
  }
}
