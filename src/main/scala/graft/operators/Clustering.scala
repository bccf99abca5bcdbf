package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed k-means (Lloyd 1982) with engine-exact determinism — the
  * clustering step behind semantic dedup and IVF/PQ codebook training.
  *
  * Why this is reproducible bit-for-bit when textbook k-means is not:
  *  - init is data-derived (the first k vector ids), no RNG;
  *  - the assignment distance folds (v_d − c_d)² left-to-right over dims in
  *    double — a fixed sequential order, never a parallel reduction;
  *  - the centroid UPDATE — the one genuinely parallel sum — runs in exact
  *    DECIMAL(25,10), which is order-independent. A float cast to a decimal
  *    can never sit exactly on a rounding tie (the tie remainder 5·10⁻¹¹ has
  *    a factor-5 denominator, unrepresentable in binary), so the cast itself
  *    is also engine-independent;
  *  - argmin ties break on the lower cluster id.
  *
  * Scale shape per iteration: the k centroids collapse to ONE broadcast
  * array row and assignment is a per-row fold over it — genuinely no corpus
  * shuffle (the earlier crossJoin + groupBy(id) argmin re-shuffled one row
  * per corpus row per round) — and the update consumes the vector carried
  * through the assignment (no corpus re-join): one posexplode + groupBy
  * (cluster, dim), shuffle volume k·D rows after map-side partial agg,
  * independent of corpus size. Iterations are bounded and
  * driver-coordinated like Dedup.resolveClusters; k·D stays executor-tiny. */
object Clustering {

  /** The k ∝ corpus policy for cluster-blocked work (SemDeDup et al.):
    * `max(kMin, ceil(rows / targetClusterSize))`. Pinning the EXPECTED
    * cluster size — instead of k — keeps within-cluster pair work
    * O(rows · targetClusterSize) ≈ linear in the corpus, where a fixed k
    * degrades to O(rows²/k) as the corpus grows. Callers of
    * [[kmeansLloyd]]/[[centroidOutliers]] at unbounded scale should derive k
    * here rather than hard-coding one. */
  def autoK(rows: Long, targetClusterSize: Long, kMin: Int = 4): Int = {
    require(targetClusterSize >= 1 && kMin >= 1)
    math.max(kMin.toLong, (rows + targetClusterSize - 1) / targetClusterSize)
      .min(Int.MaxValue).toInt
  }

  /** `iters` Lloyd rounds from the deterministic init; returns (id, cluster)
    * after the FINAL assignment. Init centroids are the vectors with the k
    * SMALLEST ids (in double), labeled cluster 0..k−1 in id order — robust
    * to 1-based, sparse, or hash-derived id spaces (a value filter `id < k`
    * would silently under- or zero-initialize those). The k-row sort+limit
    * is a TakeOrdered, not a global sort; the single-partition window that
    * numbers it touches k rows only. */
  def kmeansLloyd(emb: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame =
    kmeansAssignments(emb, idCol, vecCol, k, iters)
      .select(col(idCol), col("cluster"))

  // the deterministic init shared by every Lloyd entry point: the k
  // smallest-id vectors, renumbered 0..k-1 — ONE implementation, because a
  // drift here silently changes every kmeans-derived oracle hash
  private def initCentroids(emb: DataFrame, idCol: String,
                            vecCol: String, k: Int): DataFrame = {
    val asDouble = transform(col(vecCol), x => x.cast("double"))
    val wInit = Window.orderBy(col(idCol))
    emb.select(col(idCol), asDouble.as("c"))
      .orderBy(col(idCol)).limit(k)
      .select((row_number().over(wInit) - 1).as("cluster"), col("c"))
  }

  /** The trained centroids themselves (cluster, centroid array<double>) —
    * the coarse-quantizer output an incremental vector index stores and
    * broadcasts as literals at assignment time. Same deterministic init and
    * loop as [[kmeansLloyd]] (one more `update` than the assignment the
    * Lloyd queries emit — they report vs the PRE-final-update centroids). */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1)
    var centroids = initCentroids(emb, idCol, vecCol, k)
    for (_ <- 1 to iters)
      centroids = update(assign(emb, idCol, vecCol, centroids), vecCol)
    centroids
  }

  /** The loop behind [[kmeansLloyd]], returning the final assignment WITH
    * its squared distance to the assigned (final-round) centroid — the raw
    * material for prototypicality filtering. */
  private def kmeansAssignments(emb: DataFrame, idCol: String, vecCol: String,
                                k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1)
    var centroids = initCentroids(emb, idCol, vecCol, k)
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(emb, idCol, vecCol, centroids)
      centroids = update(assigned, vecCol)
    }
    assigned.select(col(idCol), col("cluster"), col("d2"))
  }

  /** Semantic-outlier report (the SemDeDup-adjacent *prototypicality*
    * filter, Abbas 2023 §4 / Sorscher 2022): cluster the corpus, then flag
    * every vector whose squared distance to its OWN centroid exceeds that
    * cluster's `q`-th DISCRETE percentile — far-from-prototype rows are
    * mislabeled/off-topic/garbled candidates, and percentile-per-cluster
    * adapts the cut to each cluster's spread (a global cut would gut tight
    * clusters and keep loose ones whole). d² is quantized to INTEGER
    * micro-units — floor(d²·10⁶), one IEEE multiply + floor, identical in
    * any engine — NOT round(d², 6): decimal rounding of a double diverges
    * across engines near half-ties (the JVM rounds the shortest decimal
    * string, C engines round the binary value), and a percentile cut
    * surfaces exactly such boundary values. The bounds table is k rows,
    * broadcast back. Output: (id, cluster, d2_micro, is_outlier) for every
    * input vector. */
  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int, q: Double): DataFrame = {
    require(q > 0 && q < 1, s"percentile q must be in (0,1), got $q")
    val withD = kmeansAssignments(emb, idCol, vecCol, k, iters)
      .select(col(idCol), col("cluster"),
        floor(col("d2") * lit(1000000.0)).cast("long").as("d2_micro"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pin + materialize: withD feeds BOTH the bounds aggregate and the final
    // join, and exchange reuse does not fire across join subtrees — without
    // this the whole iters-round Lloyd lineage executes twice (the
    // keySkewReport pattern; reclaim via clearCache, house contract)
    withD.count()
    val bounds = withD.groupBy(col("cluster")).agg(
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY d2_micro)").as("__hi"))
    withD.join(broadcast(bounds), "cluster")
      .withColumn("is_outlier", col("d2_micro") > col("__hi"))
      .select(col(idCol), col("cluster"), col("d2_micro"), col("is_outlier"))
  }

  /** Nearest-centroid assignment with ZERO corpus shuffle: the k centroids
    * collapse to ONE sorted array row (ascending cluster id — collect_list
    * order is partition-dependent, the sort restores determinism) that
    * broadcasts onto the corpus scan, and the argmin is a sequential fold
    * over that array per row — replacing the previous
    * crossJoin + groupBy(id) form whose k-fanout re-shuffled one row per
    * corpus row every Lloyd round. Identical results: d² folds left-to-right
    * over dims exactly as before, the fold visits clusters ascending and
    * replaces only on strictly smaller d², so ties keep the lower cluster id
    * — the same (d2, cluster) struct-min order. The raw (float) vector rides
    * along so [[update]] needs no re-join with the corpus. A vector whose d²
    * is null against every centroid (null vector or ragged dims vs the
    * centroid length) FAILS LOUDLY via raise_error — silently dropping it
    * would make centroidOutliers lose rows with no signal (advice r6). */
  private def assign(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame): DataFrame = {
    val cents = centroids.agg(
      array_sort(collect_list(struct(col("cluster"), col("c")))).as("__cents"))
    // the assignment argmin is the hot loop (rows·k·D): the native
    // NearestCentroid expression runs it as one primitive JVM loop per row;
    // the HOF form below pays one interpreted Catalyst lambda per element
    // (~50× the constant — 226 s vs seconds for q73's sf1 sweep) and stays
    // as the oracle-parity fallback (spark.graft.native.centroid=false)
    val useNative = emb.sparkSession.conf
      .get("spark.graft.native.centroid", "true") == "true"
    val best =
      if (useNative)
        graft.plans.VectorExpressions.nearestCentroid(col(vecCol), col("__cents"))
      else aggregate(
        col("__cents"),
        struct(lit(Double.MaxValue).as("d2"), lit(-1).as("cluster")),
        (acc, cent) => {
          val d2 = aggregate(
            zip_with(col(vecCol), cent.getField("c"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (s, x) => s + x)
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), cent.getField("cluster").as("cluster")))
            .otherwise(acc)
        })
    val validated = when(col("__best.cluster") >= 0, col("__best"))
      .otherwise(raise_error(concat(
        lit("kmeans assign: vector id="), col(idCol).cast("string"),
        lit(" has no finite distance to any centroid (null vector or ragged" +
          " dims vs centroid length) — clean the input before clustering"))))
    emb.crossJoin(broadcast(cents))
      .select(col(idCol), col(vecCol), best.as("__best"))
      .select(col(idCol), col(vecCol), validated.getField("cluster").as("cluster"),
        validated.getField("d2").as("d2"))
  }

  /** Per-(cluster, dim) mean in exact decimal, rebuilt into centroid arrays
    * ordered by dim. Empty clusters drop out (standard Lloyd); consumes the
    * vector carried through [[assign]] — no corpus re-join. */
  private def update(assigned: DataFrame, vecCol: String): DataFrame =
    assigned.filter(col("cluster").isNotNull)
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg((sum(col("v").cast(DecimalType(25, 10))).cast("double") /
        count(lit(1))).as("cd"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cd")))),
        x => x.getField("cd")).as("c"))
}
