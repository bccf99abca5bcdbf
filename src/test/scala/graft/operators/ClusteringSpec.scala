package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kmeansLloyd: separates two obvious blobs regardless of init spread") {
    // ids 0,1 seed the two init centroids; blob A near (0,0), blob B near (10,10)
    val df = vecs(
      0L -> Seq(0.1f, 0.0f), 1L -> Seq(9.9f, 10.1f),
      2L -> Seq(0.2f, 0.1f), 3L -> Seq(10.2f, 9.8f),
      4L -> Seq(0.0f, 0.3f), 5L -> Seq(9.7f, 10.0f))
    val out = Clustering.kmeansLloyd(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(0L, 2L, 4L).map(out) == Set(0))
    assert(Set(1L, 3L, 5L).map(out) == Set(1))
  }

  test("kmeansLloyd: deterministic across reruns (no RNG anywhere)") {
    val df = vecs((0L to 19L).map(i =>
      i -> Seq((i % 7).toFloat / 3f, (i % 5).toFloat / 2f, (i % 3).toFloat)): _*)
    val a = Clustering.kmeansLloyd(df, "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val b = Clustering.kmeansLloyd(df, "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a == b)
    // every vector assigned exactly once
    assert(a.map(_._1) == (0L to 19L))
  }

  test("autoK pins expected cluster size: ceil division, kMin floor") {
    assert(Clustering.autoK(500, 125, kMin = 4) == 4)
    assert(Clustering.autoK(501, 125, kMin = 4) == 5)  // ceil, not floor
    assert(Clustering.autoK(2000, 125, kMin = 4) == 16)
    assert(Clustering.autoK(20000, 125, kMin = 4) == 160)
    assert(Clustering.autoK(10, 125, kMin = 4) == 4)   // kMin floor
    assert(Clustering.autoK(0, 125, kMin = 4) == 4)
  }

  test("null ELEMENTS also fail loudly on the native path (zip_with parity)") {
    // a null slot must null the distance to every centroid and raise — the
    // native loop reading it as 0.0 would silently assign a wrong cluster
    // where the HOF fallback raises (r7 review finding)
    val df = Seq(
      (0L, Seq[java.lang.Float](0.0f, 0.0f)),
      (1L, Seq[java.lang.Float](10f, 10f)),
      (2L, Seq[java.lang.Float](1.0f, null))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Clustering.kmeansLloyd(df, "vec_id", "embedding", k = 2, iters = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("no finite distance") && m.contains("id=2")),
      messages(ex).mkString(" | "))
  }

  test("ragged/null vectors fail loudly instead of silently dropping") {
    // id=2's vector is shorter than the centroids' dims: zip_with nulls the
    // distance to every centroid. The old behavior emitted a null cluster
    // (and centroidOutliers then silently dropped the row) — now the
    // assignment raises with the offending id in the message.
    val df = vecs(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(10f, 10f), 2L -> Seq(1.0f))
    val ex = intercept[Exception] {
      Clustering.kmeansLloyd(df, "vec_id", "embedding", k = 2, iters = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("no finite distance") && m.contains("id=2")),
      messages(ex).mkString(" | "))
  }

  test("pqAssign: codes are true per-subspace argmins with low-index ties") {
    val books = Similarity.pqCodebooks(numSub = 2, ksub = 4, subDims = 3)
    val df = vecs(
      0L -> Seq(0.5f, -1f, 2f, 3f, 0f, -2f),
      1L -> Seq(-7f, 7f, 0f, 1f, 1f, 1f))
    val rows = Similarity.pqAssign(df, "embedding", books)
      .select("vec_id", "code0", "code1")
      .collect().map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2))).toMap
    // recompute the argmin in plain Scala (same LTR fold) and compare
    for ((id, v) <- Seq(0L -> Seq(0.5f, -1f, 2f, 3f, 0f, -2f),
                        1L -> Seq(-7f, 7f, 0f, 1f, 1f, 1f));
         m <- 0 until 2) {
      val sub = v.slice(m * 3, m * 3 + 3).map(_.toDouble)
      val d2s = books(m).map { c =>
        val self = sub.foldLeft(0.0)((a, x) => a + x * x)
        val cdot = sub.indices.foldLeft(0.0)((a, i) => a + sub(i) * c(i))
        self - 2.0 * cdot + c.map(x => x * x).sum
      }
      val expect = d2s.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(rows(id)(m) == expect, s"vec $id subspace $m")
    }
  }

  test("pqAssign: vectors shorter than the PQ geometry get NULL codes, not garbage") {
    val books = Similarity.pqCodebooks(numSub = 2, ksub = 2, subDims = 3)
    val df = vecs(0L -> Seq(1f, 2f, 3f, 4f, 5f, 6f), 1L -> Seq(1f, 2f))
    val rows = Similarity.pqAssign(df, "embedding", books)
      .select("vec_id", "code0", "code1").collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(rows(0L) == ((false, false)))
    assert(rows(1L) == ((true, true)))
    // non-uniform codebook geometry is rejected outright
    intercept[IllegalArgumentException] {
      Similarity.pqAssign(df, "embedding", Seq(Seq(Seq(1.0, 2.0)), Seq(Seq(1.0))))
    }
  }

  test("pqAdcTopK: ADC distance equals the scalar LUT recomputation; probe excluded") {
    val books = Similarity.pqCodebooks(numSub = 2, ksub = 4, subDims = 3)
    val data = Seq(
      0L -> Seq(0.5f, -1f, 2f, 3f, 0f, -2f),
      1L -> Seq(-7f, 7f, 0f, 1f, 1f, 1f),
      2L -> Seq(0.4f, -1f, 2f, 3f, 0f, -2f),
      3L -> Seq(2f, 2f, 2f, -3f, 1f, 0f))
    val out = Similarity.pqAdcTopK(vecs(data: _*), "vec_id", "embedding",
      probeId = 0L, books, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L)) // probe never in its own results
    // scalar recomputation: assign codes, then sum LUT entries
    val probe = data.head._2.map(_.toDouble)
    def d2(sub: Seq[Double], c: Seq[Double]): Double = {
      val self = sub.foldLeft(0.0)((a, x) => a + x * x)
      val cdot = sub.indices.foldLeft(0.0)((a, i) => a + sub(i) * c(i))
      self - 2.0 * cdot + c.map(x => x * x).sum
    }
    val expect = data.tail.map { case (id, v) =>
      val dv = v.map(_.toDouble)
      id -> (0 until 2).map { m =>
        val sub = dv.slice(m * 3, m * 3 + 3)
        val code = books(m).zipWithIndex
          .minBy { case (c, i) => (d2(sub, c), i) }._2
        d2(probe.slice(m * 3, m * 3 + 3), books(m)(code))
      }.sum
    }.toMap
    for ((id, d) <- out) assert(math.abs(d - expect(id)) < 1e-9, s"vec $id")
    // ranked ascending by distance, ties by id
    assert(out.sortBy(r => (r._2, r._1)).toSeq == out.toSeq)
  }

  test("ivfPqTopK: full nprobe equals unpruned ADC; nprobe=1 scans one list") {
    val books = Similarity.pqCodebooks(numSub = 2, ksub = 4, subDims = 3)
    val cents = Similarity.hyperplanes(2, 6)
    val data = (0L to 9L).map(i =>
      i -> (0 until 6).map(d => ((i * 7 + d * 3) % 11).toFloat - 5f))
    val df = vecs(data: _*)
    // nprobe = nLists: pruning is a no-op, must match plain ADC exactly
    val full = Similarity.ivfPqTopK(df, "vec_id", "embedding", 0L, cents,
      nprobe = 2, books, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val adc = Similarity.pqAdcTopK(df, "vec_id", "embedding", 0L, books, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == adc)
    // nprobe = 1: every result sits in the probe's own nearest list
    val one = Similarity.ivfPqTopK(df, "vec_id", "embedding", 0L, cents,
      nprobe = 1, books, k = 5).collect().map(_.getLong(0)).toSet
    val lists = Similarity.ivfAssign(df, "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("ivf_list"))).toMap
    assert(one.nonEmpty && one.forall(id => lists(id) == lists(0L)), s"$one $lists")
    assert(one.subsetOf(adc.map(_._1).toSet ++ data.tail.map(_._1)))
  }

  test("pqCodebooks: deterministic, distinct across subspaces, right shape") {
    val a = Similarity.pqCodebooks(4, 8, 16)
    val b = Similarity.pqCodebooks(4, 8, 16)
    assert(a == b)
    assert(a.size == 4 && a.forall(_.size == 8) && a.forall(_.forall(_.size == 16)))
    assert(a(0) != a(1), "subspace codebooks must differ (keyed by subspace)")
    assert(a.flatten.flatten.forall(w => w >= -7.5 && w <= 7.5))
  }

  test("int8Quantize: grid endpoints exact, constant dims code 0, error matches replay") {
    val data = Seq(
      0L -> Seq(0.0f, 10.0f),   // dim1 min -> code 0
      1L -> Seq(1.0f, 10.0f),   // dim1 max -> code 255
      2L -> Seq(0.5f, 10.0f))   // dim1 mid -> round(127.5) = 128 (half away)
    val df = vecs(data: _*)
    val out = Similarity.int8Quantize(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    // dim2 is constant: span 0 -> code 0, reconstructs exactly
    assert(out(0L)._1 == md5("0 0") && out(0L)._2 == 0.0)
    assert(out(1L)._1 == md5("255 0") && out(1L)._2 == 0.0)
    assert(out(2L)._1 == md5("128 0"))
    // replay the reconstruction arithmetic exactly: 0.5 -> 128/255
    val recon = 0.0 + 128.0 * 1.0 / 255.0
    val e = (0.5 - recon) * (0.5 - recon)
    assert(out(2L)._2 ==
      BigDecimal(0.0 + e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
