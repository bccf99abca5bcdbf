package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 continuation operators: temperature mixing, training order,
  * class balancing, percentile band trim, hard negatives, best-per-cluster
  * resolution, snapshot diff. Each oracle-checked as q102-q108; these specs
  * pin the semantic edges the oracles don't reach. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- temperatureMix ------------------------------------------------------

  test("temperatureMix damps heavy sources and is reproducible") {
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("id", "src")
    val kept = Sampling.temperatureMix(df, "src", "id", targetK = 200)
    val bysrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keepBig = bysrc.getOrElse("big", 0L).toDouble / 900
    val keepSmall = bysrc.getOrElse("small", 0L).toDouble / 100
    // α=1/2: keep-rate ∝ 1/√n_s, so the small source keeps a ~3x larger
    // fraction (√900/√100 = 3); require a strict gap, not the exact ratio
    assert(keepSmall > keepBig,
      s"small-source keep rate $keepSmall must exceed big-source $keepBig")
    // deterministic: the same call selects the same ids
    assert(sortedRows(kept) == sortedRows(
      Sampling.temperatureMix(df, "src", "id", targetK = 200)))
    // expectation sanity: within a loose band of the target
    val n = kept.count()
    assert(n > 100 && n < 400, s"expected ~200 kept, got $n")
  }

  test("temperatureMix keeps everything when targetK >= corpus, drops null strata") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("id", "src")
    val kept = Sampling.temperatureMix(df, "src", "id", targetK = 100)
    assert(kept.count() == 2) // null stratum dropped, p=1 for the rest
  }

  // ---- trainingOrder -------------------------------------------------------

  test("trainingOrder emits a complete permutation with contiguous per-shard positions") {
    val df = (1L to 500L).toDF("id")
    val ord = Sampling.trainingOrder(df, "id", shards = 4, seed = 7L).cache()
    try {
      assert(ord.count() == 500)
      assert(ord.select("id").distinct().count() == 500)
      // positions are 1..n_shard within every shard
      val bad = ord.groupBy("shard")
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      assert(bad.isEmpty, "per-shard positions must be contiguous from 1")
      // deterministic; a different seed produces a different permutation
      val again = Sampling.trainingOrder(df, "id", shards = 4, seed = 7L)
      assert(sortedRows(ord) == sortedRows(again))
      val other = Sampling.trainingOrder(df, "id", shards = 4, seed = 8L)
      assert(sortedRows(ord) != sortedRows(other))
    } finally ord.unpersist()
  }

  // ---- classBalance --------------------------------------------------------

  test("classBalance cuts every class to the smallest class size") {
    val df = ((1 to 50).map(i => (i.toLong, 0)) ++ (51 to 70).map(i => (i.toLong, 1)) ++
      (71 to 77).map(i => (i.toLong, 2))).toDF("id", "lbl")
    val out = Sampling.classBalance(df, "lbl", "id")
    val sizes = out.groupBy("lbl").count().collect().map(_.getLong(1)).toSet
    assert(sizes == Set(7L), s"every class must have exactly 7 rows, got $sizes")
    assert(sortedRows(out) == sortedRows(Sampling.classBalance(df, "lbl", "id")))
  }

  test("classBalance treats null labels as their own class") {
    val df = Seq((1L, java.lang.Integer.valueOf(0)), (2L, java.lang.Integer.valueOf(0)),
      (3L, null.asInstanceOf[java.lang.Integer])).toDF("id", "lbl")
    val out = Sampling.classBalance(df, "lbl", "id")
    // min class = the null class (1 row) -> one row per class survives
    assert(out.count() == 2)
    assert(out.filter(col("lbl").isNull).count() == 1)
  }

  // ---- percentileBand ------------------------------------------------------

  test("percentileBand keeps rows inside their own stratum's discrete bounds") {
    val df = ((1 to 100).map(i => (i.toLong, "en", i.toLong)) ++
      (101 to 120).map(i => (i.toLong, "de", (i * 100).toLong))).toDF("id", "lang", "len")
    val out = Sampling.percentileBand(df, "lang", "len", 0.10, 0.90).cache()
    try {
      // en: values 1..100, p10=10 p90=90 discrete -> 81 rows survive
      assert(out.filter(col("lang") === "en").count() == 81)
      // de rows judged against de's own (much larger) bounds, not en's
      assert(out.filter(col("lang") === "de").count() > 0)
      val deMin = out.filter(col("lang") === "de").agg(min("len")).head().getLong(0)
      assert(deMin >= 10100L, "de bounds must come from the de distribution")
    } finally out.unpersist()
  }

  test("percentileBand drops null values and null strata") {
    val df = Seq((1L, "en", java.lang.Long.valueOf(5L)),
      (2L, "en", null.asInstanceOf[java.lang.Long]),
      (3L, null.asInstanceOf[String], java.lang.Long.valueOf(5L))).toDF("id", "lang", "len")
    assert(Sampling.percentileBand(df, "lang", "len", 0.0, 1.0).count() == 1)
  }

  // ---- hardNegatives -------------------------------------------------------

  test("hardNegatives returns only cross-label neighbors, ranked like the window reference") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.8f, 0.2f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(0.7f, 0.3f), 2)).toDF("id", "vec", "lbl")
    val probe = vecs.filter(col("id") === 1)
    val out = Similarity.hardNegatives(vecs, "id", "vec", "lbl",
      probe, "id", "vec", "lbl", k = 2).collect()
    // nearest different-label vectors to (1,0): id 3 (cos .970) then id 5 (.919)
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 5L))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L))
    // same-label id 2 (cos .994, the nearest overall) must NOT appear
    assert(!out.map(_.getLong(1)).contains(2L))
  }

  test("hardNegatives drops null-label pairs on either side") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), java.lang.Integer.valueOf(0)),
      (2L, Seq(0.9f, 0.1f), null.asInstanceOf[java.lang.Integer]),
      (3L, Seq(0.8f, 0.2f), java.lang.Integer.valueOf(1))).toDF("id", "vec", "lbl")
    val out = Similarity.hardNegatives(vecs, "id", "vec", "lbl",
      vecs, "id", "vec", "lbl", k = 3)
    // null-label probe 2 gets no rows; null-label neighbor 2 never appears
    assert(out.filter(col("probe_id") === 2L).isEmpty)
    assert(out.filter(col("neighbor_id") === 2L).isEmpty)
    assert(out.filter(col("probe_id") === 1L).select("neighbor_id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  // ---- bestPerCluster ------------------------------------------------------

  test("bestPerCluster keeps the top-scoring member, min id on ties, singletons pass") {
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (10L, 0.3))
      .toDF("id", "score")
    // cluster {1,2,3} (chained pairs) and {4}? no - 4 pairs with nothing; 10 singleton
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Dedup.bestPerCluster(scored, "id", "score", pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // cluster 1: winner id 2 (0.9 ties with 3, lower id wins), 3 members
    assert(out.contains((1L, 2L, 0.9, 3L)))
    // 4 and 10 are singletons: own cluster, 1 member
    assert(out.contains((4L, 4L, 0.1, 1L)))
    assert(out.contains((10L, 10L, 0.3, 1L)))
    assert(out.length == 3)
  }

  test("bestPerCluster with no pairs returns every doc as its own cluster") {
    val scored = Seq((1L, 0.5), (2L, 0.9)).toDF("id", "score")
    val pairs = spark.emptyDataFrame.select(lit(0L).as("a"), lit(0L).as("b")).limit(0)
    val out = Dedup.bestPerCluster(scored, "id", "score", pairs, "a", "b")
    assert(out.count() == 2)
    assert(out.filter(col("cluster_id") === col("keep_id")).count() == 2)
  }

  // ---- snapshotDiff --------------------------------------------------------

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "txt")
    val neu = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "txt")
    val got = Relational.snapshotDiff(old, neu, "id", Seq("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff distinguishes null payload from empty string") {
    val old = Seq((1L, null.asInstanceOf[String])).toDF("id", "txt")
    val neu = Seq((1L, "")).toDF("id", "txt")
    val got = Relational.snapshotDiff(old, neu, "id", Seq("txt")).head().getString(1)
    assert(got == "changed")
  }

  // ---- bigramNll -----------------------------------------------------------

  test("bigramNll matches the hand-computed interpolated model") {
    // corpus: two copies of "a b". unigrams a:2 b:2 (N=4, V=2); bigram
    // "a b" count 2. per-gram p = ½·(2+1)/(4+2) + ½·(2+1)/(2+2) = 0.625;
    // −ln(0.625) = 0.470004 (rounded at 6)
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("id", "txt")
    val out = TextStats.bigramNll(docs, "id", "txt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 0.470004), (2L, 1L, 0.470004)))
  }

  test("bigramNll scores unseen transitions worse and skips sub-bigram docs") {
    // "b a" never occurs as a bigram in this corpus -> its doc scores a
    // strictly higher NLL per gram than the common "a b" docs
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "b a"), (5L, "x"))
      .toDF("id", "txt")
    val out = TextStats.bigramNll(docs, "id", "txt").cache()
    try {
      val common = out.filter(col("id") === 1L).head().getDouble(2)
      val rare = out.filter(col("id") === 4L).head().getDouble(2)
      assert(rare > common, s"unseen transition must score worse: $rare vs $common")
      assert(out.filter(col("id") === 5L).isEmpty) // one token, no bigram, no row
    } finally out.unpersist()
  }

  // ---- oovRate -------------------------------------------------------------

  test("oovRate cuts the vocabulary by (count desc, token asc) and rates per doc") {
    // counts: a:3 b:3 c:1 -> top-2 vocab {a, b} (tie broken lexicographically
    // would matter at the boundary; here the cut excludes c)
    val docs = Seq((1L, "a a a b"), (2L, "b b c"), (3L, "a c")).toDF("id", "txt")
    val out = TextStats.oovRate(docs, "id", "txt", vocabSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 4L, 0L, 0.0), (2L, 3L, 1L, 0.333333), (3L, 2L, 1L, 0.5)))
  }

  // ---- crossSplitPairs -----------------------------------------------------

  test("crossSplitPairs keeps only pairs straddling a split boundary") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val splits = Seq((1L, "train"), (2L, "train"), (3L, "test")).toDF("id", "split")
    val out = Sampling.crossSplitPairs(pairs, "a", "b", splits, "id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L))) // (1,2) is within-train
  }

  // ---- corpusDrift ---------------------------------------------------------

  test("corpusDrift is exactly zero for identical corpora, positive under drift") {
    val a = Seq((1L, "a b c"), (2L, "a b")).toDF("id", "txt")
    val same = TextStats.corpusDrift(a, a, "id", "txt").head()
    // p_A(t) == p_B(t) for every term -> every ln ratio is exactly 0
    assert(same.getDouble(2) == 0.0)
    assert(same.getLong(0) == 3L && same.getLong(1) == 5L) // union vocab, A tokens
    val b = Seq((1L, "x y z"), (2L, "x y")).toDF("id", "txt")
    val drifted = TextStats.corpusDrift(a, b, "id", "txt").head()
    assert(drifted.getDouble(2) > 0.0, s"disjoint vocab must drift positive")
    assert(drifted.getLong(0) == 6L) // union of both vocabularies
  }

  // ---- coverageCurve -------------------------------------------------------

  test("coverageCurve reports top-k bigram mass fractions") {
    // bigrams: "a b" x3 ("a b a" gives 'a b','b a'; plus two "a b" docs),
    // "b a" x1 -> total 4; top-1 covers 3/4, top-2 covers 4/4
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "a b")).toDF("id", "txt")
    val out = TextStats.coverageCurve(docs, "id", "txt", ks = Seq(1, 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, 3L, 4L, 0.75), (2, 4L, 4L, 1.0)))
  }

  // ---- centroidOutliers ----------------------------------------------------

  test("centroidOutliers flags the far-from-prototype vector per cluster") {
    // two tight clusters near (0,0) and (10,10), plus one stray far from
    // both; with the per-cluster p75 cut only the stray is flagged
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)), (3L, Seq(0.0f, 0.1f)),
      (4L, Seq(0.1f, 0.1f)),
      (10L, Seq(10.0f, 10.0f)), (11L, Seq(10.1f, 10.0f)), (12L, Seq(10.0f, 10.1f)),
      (13L, Seq(10.1f, 10.1f)),
      (99L, Seq(6.0f, 6.0f))).toDF("id", "vec")
    val out = Clustering.centroidOutliers(vecs, "id", "vec", k = 2, iters = 3, q = 0.75)
      .cache()
    try {
      assert(out.count() == 9) // every vector reported
      val flagged = out.filter(col("is_outlier")).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(flagged == Set(99L), s"only the stray should flag, got $flagged")
      // d2_micro is a nonnegative integer
      assert(out.filter(col("d2_micro") < 0).isEmpty)
    } finally out.unpersist()
  }

  // ---- linearQualityScore --------------------------------------------------

  test("linearQualityScore: integer logits, deterministic, token-additive") {
    val d = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), // identical docs, identical logits
      (3L, "alpha alpha beta"),               // one extra alpha
      (4L, null.asInstanceOf[String]), (5L, "   ")) // no tokens -> no row
      .toDF("doc_id", "text")
    val out = TextStats.linearQualityScore(d, "doc_id", "text",
      buckets = 64, biasMicro = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == out(2L))
    // logit(3) - logit(1) == weight of one more 'alpha' == logit("alpha alpha")/2
    val single = TextStats.linearQualityScore(
      Seq((9L, "alpha")).toDF("doc_id", "text"), "doc_id", "text", 64, 0L)
      .head().getLong(2)
    assert(out(3L)._2 - out(1L)._2 == single)
    assert(out.values.forall { case (_, l, kept) => kept == (l > 0) })
  }

  // ---- noveltyScore --------------------------------------------------------

  test("noveltyScore: first doc scores 1, exact copy 0, partial overlap in between") {
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),          // full copy of 1
      (3L, "alpha beta totally new tail here") // shares one bigram with 1
    ).toDF("doc_id", "text")
    val out = TextStats.noveltyScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (3L, 3L, 1.0))
    assert(out(2L) == (3L, 0L, 0.0))
    val (n3, f3, nov3) = out(3L)
    assert(n3 == 5L && f3 == 4L && nov3 == 0.8) // 'alpha beta' first seen in doc 1
  }

  // ---- madOutliers ---------------------------------------------------------

  test("madOutliers flags the planted extreme; medians are robust to it") {
    val d = (Seq.tabulate(9)(i => (i.toLong, "s", 100L + i)) :+ ((99L, "s", 100000L)))
      .toDF("id", "src", "v")
    val out = Sampling.madOutliers(d, "src", "v", k = 3)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        (r.getLong(r.fieldIndex("med")), r.getLong(r.fieldIndex("mad")),
          r.getBoolean(r.fieldIndex("is_outlier")))).toMap
    // median/MAD ignore the planted 100000: med=104, mad=2 over 100..108,100000
    val (med, mad, _) = out(0L)
    assert(med == 104L && mad == 2L)
    assert(out(99L)._3, "the planted extreme must flag")
    assert(out.filterKeys(_ != 99L).values.forall(!_._3), "no inlier may flag")
  }

  // ---- histogramPercentiles ------------------------------------------------

  test("histogramPercentiles: exact discrete percentile always inside [lo, hi]") {
    val d = (1L to 1000L).map(i => (i, (i * i) % 997)).toDF("id", "v")
    val out = Sampling.histogramPercentiles(d, "v", bins = 32,
      pcts = Seq(50, 90, 99)).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set(50, 90, 99))
    for (p <- Seq(50, 90, 99)) {
      val exact = d.agg(expr(s"percentile_disc(0.${if (p < 100) f"$p%02d" else ""}) " +
        "WITHIN GROUP (ORDER BY v)").cast("long")).head().getLong(0)
      val (lo, hi, cum) = out(p)
      assert(exact >= lo && exact <= hi,
        s"p$p: exact $exact outside histogram bucket [$lo, $hi]")
      assert(cum * 100 >= p * 1000L)
    }
    // degenerate: all-equal values collapse to bucket 0 == the value itself
    val const = Seq.fill(10)(7L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val c = Sampling.histogramPercentiles(const, "v", bins = 8, pcts = Seq(50))
      .head()
    assert(c.getLong(2) == 7L && c.getLong(3) == 7L)
  }

  // ---- keySkewReport -------------------------------------------------------

  test("keySkewReport surfaces the hot key with its exact integer share") {
    val d = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val out = graft.quality.DataQuality.keySkewReport(d, "key", k = 3).collect()
    assert(out.head.getString(0) == "hot")
    assert(out.head.getLong(1) == 60L)
    assert(out.head.getLong(2) == 600000L) // 60/100 in micro-units, exact
    assert(out.length == 3)
    // ties break on the key value ascending
    assert(out(1).getString(0) == "k1" && out(2).getString(0) == "k10")
  }
}
