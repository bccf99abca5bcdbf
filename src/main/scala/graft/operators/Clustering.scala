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
  * Scale shape per iteration: one broadcast join against the k-row centroid
  * table for assignment (no corpus shuffle), one posexplode + groupBy
  * (cluster, dim) for the update — shuffle volume k·D rows, independent of
  * corpus size after the map-side partial agg. Iterations are bounded and
  * driver-coordinated like Dedup.resolveClusters; k·D stays executor-tiny. */
object Clustering {

  /** `iters` Lloyd rounds from the deterministic init; returns (id, cluster)
    * after the FINAL assignment. Init centroids are the vectors with the k
    * SMALLEST ids (in double), labeled cluster 0..k−1 in id order — robust
    * to 1-based, sparse, or hash-derived id spaces (a value filter `id < k`
    * would silently under- or zero-initialize those). The k-row sort+limit
    * is a TakeOrdered, not a global sort; the single-partition window that
    * numbers it touches k rows only. */
  def kmeansLloyd(emb: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1)
    val asDouble = transform(col(vecCol), x => x.cast("double"))
    val wInit = Window.orderBy(col(idCol))
    var centroids = emb.select(col(idCol), asDouble.as("c"))
      .orderBy(col(idCol)).limit(k)
      .select((row_number().over(wInit) - 1).as("cluster"), col("c"))
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(emb, idCol, vecCol, centroids)
      centroids = update(emb, idCol, vecCol, assigned)
    }
    assigned
  }

  /** Nearest-centroid assignment: d² folded left-to-right per (vector,
    * centroid); argmin = min over (d2, cluster) structs. The centroid table
    * is k rows — broadcast, so the corpus never shuffles. */
  private def assign(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame): DataFrame = {
    val d2 = aggregate(
      zip_with(col(vecCol), col("c"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    emb.crossJoin(broadcast(centroids))
      .select(col(idCol), struct(d2.as("d2"), col("cluster")).as("dc"))
      .groupBy(col(idCol)).agg(min(col("dc")).as("best"))
      .select(col(idCol), col("best.cluster").as("cluster"))
  }

  /** Per-(cluster, dim) mean in exact decimal, rebuilt into centroid arrays
    * ordered by dim. Empty clusters drop out (standard Lloyd). */
  private def update(emb: DataFrame, idCol: String, vecCol: String,
                     assigned: DataFrame): DataFrame =
    emb.join(assigned, idCol)
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg((sum(col("v").cast(DecimalType(25, 10))).cast("double") /
        count(lit(1))).as("cd"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cd")))),
        x => x.getField("cd")).as("c"))
}
