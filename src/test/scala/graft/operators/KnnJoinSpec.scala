package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch kNN join (q83/q84): correctness on planted geometry, deterministic
  * tie-breaks, and the scale-critical plan shape — a bounded top-k heap that
  * PARTIALLY aggregates before the only exchange, so shuffle volume is
  * k x probes x partitions, never the candidate count. */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  // planted 2-d geometry: unit vectors at known angles from the +x axis.
  // cos(v0, v*) ranks v1 (15deg) > v2 (30deg) > v3 (60deg) > v4 (90deg).
  private def unit(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }
  private lazy val corpus = Seq(
    (0L, unit(0)), (1L, unit(15)), (2L, unit(30)), (3L, unit(60)), (4L, unit(90))
  ).toDF("vec_id", "embedding")

  test("knnJoin ranks neighbors by cosine, self excluded") {
    val probe = corpus.filter(col("vec_id") === 0)
    val got = Similarity.knnJoin(corpus, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 3, excludeSelf = true)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_.getLong(0) == 0L))
    // scores are the rounded cosines of the planted angles
    val cos15 = got(0).getDouble(2)
    assert(math.abs(cos15 - math.cos(math.toRadians(15))) < 1e-6)
  }

  test("knnJoin returns every probe's block; k caps at corpus size") {
    val probe = corpus.filter(col("vec_id") <= 1)
    val got = Similarity.knnJoin(corpus, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 10, excludeSelf = true)
    val byProbe = got.collect().groupBy(_.getLong(0))
    assert(byProbe.keySet == Set(0L, 1L))
    assert(byProbe.values.forall(_.length == 4)) // 5 corpus - self
  }

  test("equal scores tie to the lower neighbor id (oracle row_number parity)") {
    // two corpus vectors identical to each other: same cosine to any probe
    val dup = Seq((10L, unit(45)), (11L, unit(45)), (12L, unit(0)))
      .toDF("vec_id", "embedding")
    val probe = Seq((99L, unit(45))).toDF("vec_id", "embedding")
    val got = Similarity.knnJoin(dup, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 11L)) // not (11, 10)
  }

  test("zero-norm corpus vectors are dropped, not ranked as null") {
    val withZero = corpus.union(
      Seq((5L, Array(0f, 0f))).toDF("vec_id", "embedding"))
    val probe = corpus.filter(col("vec_id") === 0)
    val got = Similarity.knnJoin(withZero, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 10, excludeSelf = true)
    assert(!got.collect().map(_.getLong(1)).contains(5L))
  }

  test("plan: partial top-k aggregation before the single keyed exchange; probe broadcast") {
    val probe = corpus.filter(col("vec_id") === 0)
    val p = Similarity.knnJoin(corpus, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 3, excludeSelf = true)
      .queryExecution.executedPlan.toString
    // Aggregator-backed udaf plans as ObjectHashAggregate, partial then final
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exactly one shuffle: the k-bounded partial results keyed on probe_id
    assert("Exchange hashpartitioning\\(probe_id".r.findAllIn(p).size == 1, p)
  }

  test("property: heap aggregation == declarative window rank on random corpora") {
    // the risky part of a hand-rolled Aggregator is merge order under
    // partitioning; pin it against the declarative row_number reference on
    // deterministic pseudo-random data WITH planted exact ties, across
    // different partition counts (different merge trees)
    val rnd = new scala.util.Random(42)
    val dims = 8
    val corpus = (0L until 200L).map { i =>
      // every 4th vector duplicates its predecessor -> exact cosine ties
      if (i % 4 == 3) (i, lastVec) else { lastVec = Array.fill(dims)(rnd.nextFloat() - 0.3f); (i, lastVec) }
    }.toDF("vec_id", "embedding")
    val probe = corpus.filter(col("vec_id") % 40 === 0)
    for (parts <- Seq(1, 7, 32)) {
      val c = corpus.repartition(parts)
      val got = Similarity.knnJoin(c, "vec_id", "embedding",
        probe, "vec_id", "embedding", k = 7, excludeSelf = true)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1), r.getDouble(2))).toSet
      val cand = c.crossJoin(broadcast(probe.select(col("vec_id").as("probe_id"),
          col("embedding").as("pv"))))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("cos", round(graft.functions.VectorFunctions.cosine(
          col("embedding"), col("pv")), 6))
        .filter(col("cos").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
      val ref = cand.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 7)
        .collect().map(r => (r.getLong(r.fieldIndex("probe_id")),
          r.getLong(r.fieldIndex("rank")), r.getLong(r.fieldIndex("vec_id")),
          r.getDouble(r.fieldIndex("cos")))).toSet
      assert(got == ref, s"parts=$parts")
    }
  }
  private var lastVec: Array[Float] = Array.fill(8)(0.1f)

  test("ivfKnnJoin agrees with brute force restricted to shared-list candidates") {
    val cents = Similarity.hyperplanes(2, 2)
    val assigned = Similarity.ivfAssign(
      corpus.select(col("vec_id"), col("embedding").as("__cv")), "__cv", cents)
      .select(col("vec_id"), col("ivf_list")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probe = corpus.filter(col("vec_id") === 0)
    val got = Similarity.ivfKnnJoin(corpus, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 5, cents, excludeSelf = true)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // every returned neighbor shares the probe's coarse list...
    assert(got.forall { case (nid, _) => assigned(nid) == assigned(0L) }, got.toSeq)
    // ...and within the list the ranking matches the brute-force order
    val brute = Similarity.knnJoin(
      corpus.filter(col("vec_id").isin(assigned.filter(_._2 == assigned(0L)).keys.toSeq: _*)),
      "vec_id", "embedding", probe, "vec_id", "embedding", k = 5, excludeSelf = true)
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._2)
    assert(got.sortBy(_._2).toSeq == brute.toSeq)
  }

  test("knnJoin enforces the probe-side broadcast contract") {
    val probe = corpus // 5 rows, cap of 3 -> refused with the scale pointer
    val e = intercept[IllegalArgumentException] {
      Similarity.knnJoin(corpus, "vec_id", "embedding",
        probe, "vec_id", "embedding", k = 2, maxBroadcastProbes = 3L)
    }
    assert(e.getMessage.contains("cannot broadcast"))
    // raising the cap explicitly restores the join
    val ok = Similarity.knnJoin(corpus, "vec_id", "embedding",
      probe, "vec_id", "embedding", k = 2, maxBroadcastProbes = 5L)
    assert(ok.count() == 10L)
  }
}
