package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 fourth-wave operators: JL random projection, C4 blocklist filter,
  * and the ANN recall invariant. */
class ProjectionBlocklistSpec extends SparkSpec {
  import spark.implicits._

  // ---- blocklistFilter ------------------------------------------------------

  test("blocklistFilter drops docs containing any blocked token (q94)") {
    val docs = Seq(
      (1, "clean words only"),
      (2, "contains badword here"),
      (3, "badword"),
      (4, "badwordish is a different token")).toDF("id", "text")
    val out = TextStats.blocklistFilter(docs, "text", Seq("badword", "unused"))
      .select("id").as[Int].collect().toSet
    assert(out == Set(1, 4)) // substring match must NOT trigger (token-exact)
  }

  test("blocklistFilter keeps NULL/whitespace-only text (empty token set)") {
    val docs = Seq((1, null.asInstanceOf[String]), (2, "   "), (3, "ok"))
      .toDF("id", "text")
    val out = TextStats.blocklistFilter(docs, "text", Seq("bad"))
      .select("id").as[Int].collect().toSet
    // TF.tokens maps null/blank to an empty array — disjoint from any list
    assert(out == Set(1, 2, 3))
  }

  test("blocklistFilter rejects an empty blocklist") {
    val docs = Seq((1, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      TextStats.blocklistFilter(docs, "text", Seq.empty)
    }
  }

  test("blocklistFilter is one exchange-free scan") {
    val docs = Seq((1, "x y"), (2, "z")).toDF("id", "text")
    val planStr = TextStats.blocklistFilter(docs, "text", Seq("z"))
      .queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"), s"expected no exchange:\n$planStr")
  }

  // ---- randomProjection -----------------------------------------------------

  private def oneHot(d: Int, dims: Int): Seq[Float] =
    Seq.tabulate(dims)(i => if (i == d) 1f else 0f)

  test("randomProjection emits outDims components from the hyperplane signs (q96)") {
    val emb = Seq((0L, oneHot(3, 8)), (1L, oneHot(5, 8))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(emb, "vec_id", "embedding",
      outDims = 4, dims = 8)
      .orderBy("vec_id").collect()
    val signs = Similarity.hyperplanes(4, 8).map(_.map(w => if (w >= 0) 1.0 else -1.0))
    val expected0 = (0 until 4).map(p =>
      BigDecimal(signs(p)(3) / 2.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(0).getSeq[Double](1) == expected0) // e_3 picks column 3 / sqrt(4)
    assert(out(0).getSeq[Double](1).size == 4 && out(1).getSeq[Double](1).size == 4)
  }

  test("randomProjection is linear: proj(2x) == 2*proj(x) on exact inputs") {
    val x = Seq.tabulate(8)(i => (i + 1).toFloat) // exact in binary
    val emb = Seq((0L, x), (1L, x.map(_ * 2f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(emb, "vec_id", "embedding", 4, 8)
      .orderBy("vec_id").collect()
    val p1 = out(0).getSeq[Double](1)
    val p2 = out(1).getSeq[Double](1)
    p1.zip(p2).foreach { case (a, b) => assert(math.abs(b - 2 * a) < 1e-6) }
  }

  test("randomProjection roughly preserves pairwise distance (JL sanity)") {
    // two far-apart vectors stay far apart after 64->16 projection
    val a = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val b = Seq.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val emb = Seq((0L, a), (1L, b)).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(emb, "vec_id", "embedding", 16, 64)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    def d2(u: Seq[Double], v: Seq[Double]) =
      u.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = d2(a.map(_.toDouble), b.map(_.toDouble))
    val proj = d2(out(0), out(1))
    assert(proj > orig * 0.4 && proj < orig * 2.5,
      s"projected distance $proj vs original $orig outside JL sanity band")
  }

  test("randomProjection is one exchange-free scan") {
    val emb = Seq((0L, oneHot(0, 8))).toDF("vec_id", "embedding")
    val planStr = Similarity.randomProjection(emb, "vec_id", "embedding", 4, 8)
      .queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"), s"expected no exchange:\n$planStr")
  }

  // ---- ANN recall invariant (q97 composition) --------------------------------

  test("ivfKnnJoin with a single list recalls brute-force truth exactly") {
    // nLists=1 => no blocking: every candidate is in the probe's list, so
    // recall@k must be 1.0 — the invariant that makes q97 a real measurement
    val vecs = (0L until 30L).map(i =>
      (i, Seq.tabulate(8)(d => math.sin(i * 8 + d + 1).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") % 10 === 0)
    val truth = Similarity.knnJoin(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", k = 3, excludeSelf = true)
      .select("probe_id", "neighbor_id")
    val approx = Similarity.ivfKnnJoin(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", k = 3,
      Similarity.hyperplanes(1, 8), excludeSelf = true)
      .select("probe_id", "neighbor_id")
    assert(truth.collect().toSet == approx.collect().toSet)
  }
}
