package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.functions.{VectorFunctions => VF}
import graft.operators.{Clustering, Similarity}
import graft.sources.Writers

/** The lake-resident incremental VECTOR index — [[DedupLake]]'s ANN sibling
  * (reference analogue: the same scheduled-maintenance shape as the prefect
  * flows; the store a retrieval deployment actually accretes). Documents
  * arrive as embedding batches; each batch is coarse-assigned, near-dup
  * gated against the RESIDENT index, appended list-partitioned, and the
  * centroids are re-trained on a maintenance cadence once drift says they
  * no longer represent the data.
  *
  * Layout under one root (all parquet):
  *  - `vectors/`   — (vec_id, embedding, ivf_list, d2), written
  *    `partitionBy(ivf_list)` so a serving probe reads only its own lists
  *    (partition pruning is the IVF inverted file).
  *  - `centroids/` — (ivf_list, c array<double>), the coarse quantizer.
  *
  * Scale shape: ingest broadcasts the (serving-bounded) batch against the
  * resident vectors ONCE, with candidates restricted to same-list pairs —
  * the IVF analogue of LSH banding, never corpus × corpus. The centroid set
  * is k rows, collected to literals at assignment time (the broadcast-LUT
  * contract shared with PQ codebooks). Reconcile (re-train + reassign +
  * swap) is the periodic batch job, not per-ingest work.
  *
  * Concurrency/crash: same contracts as DedupLake — exclusive `_LOCK`
  * lease (fail-fast), write-new-then-swap for full rewrites, and
  * at-least-once-safe appends (anti-join on vec_id, so an exact replay of
  * a crashed batch inserts nothing). */
object VectorLake {

  val vectorsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("ivf_list", IntegerType),
    StructField("d2", DoubleType)))
  val centroidsSchema: StructType = StructType(Seq(
    StructField("ivf_list", IntegerType),
    StructField("c", ArrayType(DoubleType))))

  final case class IngestReport(kept: Long, dupsVsIndex: Long, dupsInBatch: Long)

  def withWriterLock[T](spark: SparkSession, root: String,
                        leaseMs: Long = 30 * 60 * 1000L,
                        now: () => Long = System.currentTimeMillis _)(f: => T): T =
    graft.sources.StateLock.withRootLock(spark, root, leaseMs, now)(f)

  private def readOr(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    Writers.readOrEmpty(spark, path, schema)

  /** Install the coarse quantizer. Idempotent (swap-replace). */
  def init(spark: SparkSession, root: String,
           centroids: Seq[Seq[Double]]): Unit = {
    require(centroids.size >= 2, "need >= 2 centroids")
    import scala.jdk.CollectionConverters._
    val rows = centroids.zipWithIndex
      .map { case (c, i) => org.apache.spark.sql.Row(i, c) }.asJava
    withWriterLock(spark, root) {
      Writers.swapReplace(spark, s"$root/centroids",
        spark.createDataFrame(rows, centroidsSchema))
    }
  }

  /** The stored quantizer as literals — k rows, the broadcast-LUT contract
    * (bounded by construction; this is NOT a corpus collect). */
  def centroids(spark: SparkSession, root: String): Seq[Seq[Double]] = {
    val rows = readOr(spark, s"$root/centroids", centroidsSchema)
      .orderBy("ivf_list").collect()
    require(rows.nonEmpty, s"vector lake at $root has no centroids — run init")
    rows.map(_.getSeq[Double](1).toIndexedSeq)
  }

  /** Ingest one batch: coarse-assign, drop near-dups (cosine >= threshold)
    * against the resident index — same-list candidates only — and within
    * the batch itself (lower vec_id wins, the house tie rule), then append
    * the survivors list-partitioned. Returns the report; at-least-once
    * safe: a replay's append anti-joins stored vec_ids and inserts
    * nothing. `failpoint` runs before the append (the torn window a replay
    * must repair). */
  def ingest(spark: SparkSession, root: String, batch: DataFrame,
             dupThreshold: Double = 0.95,
             failpoint: () => Unit = () => ()): IngestReport =
    withWriterLock(spark, root) {
      val cents = centroids(spark, root)
      // the embedding cast is load-bearing: an uncast array<double> batch
      // would append double-typed files into the float-typed store and
      // brick every subsequent schema-imposed read
      val assigned = Similarity.ivfAssignWithDist(
        batch.select(col("vec_id").cast("long"),
          col("embedding").cast(vectorsSchema("embedding").dataType)
            .as("embedding")),
        "embedding", cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        assigned.count()
        val stored = readOr(spark, s"$root/vectors", vectorsSchema)
        // near-dup gate vs the RESIDENT index: batch broadcast, candidates
        // pruned to same-list pairs (the IVF banding analogue)
        val vsIndex = stored.join(
            broadcast(assigned.select(col("ivf_list"),
              col("vec_id").as("__bid"), col("embedding").as("__bv"))),
            Seq("ivf_list"))
          // same-id match = an at-least-once REPLAY of an already-written
          // row, not a duplicate — excluding it keeps the replayed report
          // equal to the original (the append's anti-join dedups the write)
          .filter(col("vec_id") =!= col("__bid"))
          .filter(round(VF.cosine(col("embedding"), col("__bv")), 6)
            >= lit(dupThreshold))
          .select(col("__bid").as("vec_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // within-batch dups: same list, keep the lower id of each dup pair
        // (fully renamed right side — a raw self-join on assigned would hit
        // Spark's ambiguous-column resolution)
        val a = assigned.select(col("ivf_list").as("__la"),
          col("vec_id").as("__ida"), col("embedding").as("__va"))
        val b = assigned.select(col("ivf_list").as("__lb"),
          col("vec_id").as("__idb"), col("embedding").as("__vb"))
        val inBatch = a.join(broadcast(b),
            col("__la") === col("__lb") && col("__ida") < col("__idb"))
          .filter(round(VF.cosine(col("__va"), col("__vb")), 6)
            >= lit(dupThreshold))
          .select(col("__idb").as("vec_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // a batch vector can be a dup BOTH ways; the union is the drop set,
        // the two counts are reported independently (they may overlap).
        // Both gate frames are pinned: the report counts and the drop-set
        // union then reuse ONE resident-index scan instead of three.
        val dropIds = vsIndex.unionByName(inBatch).distinct()
        try {
          val kept = assigned.join(dropIds, Seq("vec_id"), "left_anti")
          // count EVERYTHING before the append: these plans read the store,
          // and re-evaluating them afterwards would see the batch's own
          // freshly-appended rows — every vector self-matches at cos 1 and
          // the report claims the whole batch was a dup
          val report = IngestReport(kept.count(), vsIndex.count(), inBatch.count())
          failpoint()
          // replay-safe append, scoped to the batch's ids (PricePipeline
          // idiom — never rescans the whole store)
          val storedScoped = stored.select("vec_id")
            .join(broadcast(assigned.select("vec_id")), Seq("vec_id"), "left_semi")
          val toWrite = kept.join(storedScoped, Seq("vec_id"), "left_anti")
            .select("vec_id", "embedding", "ivf_list", "d2")
          toWrite.write.mode("append").partitionBy("ivf_list")
            .parquet(s"$root/vectors")
          report
        } finally {
          vsIndex.unpersist(blocking = false)
          inBatch.unpersist(blocking = false); ()
        }
      } finally { assigned.unpersist(blocking = false); () }
    }

  def vectors(spark: SparkSession, root: String): DataFrame =
    readOr(spark, s"$root/vectors", vectorsSchema)

  /** Index-health check: q150's per-list drift report of an incoming batch
    * against the resident vectors under the CURRENT centroids. */
  def driftReport(spark: SparkSession, root: String,
                  batch: DataFrame): DataFrame =
    Similarity.ivfDriftReport(
      readOr(spark, s"$root/vectors", vectorsSchema).select("embedding"),
      batch.select("embedding"), "embedding", centroids(spark, root))

  /** Re-train the quantizer on the resident vectors (deterministic Lloyd,
    * auto-k unless overridden), REPAIR the near-dup invariant, reassign
    * everything, and swap both stores — the recluster a drifted index
    * needs. The repair pass matters for the twin-swap window: a crash
    * between the vectors and centroids swaps leaves ingests gating batch
    * lists from one quantizer against stored lists from another, so
    * near-dup twins can slip in until the next reconcile — which is why
    * reconcile deduplicates (same-NEW-list pairs at `dupThreshold`, lower
    * id wins) instead of only reassigning. Within-list pair work is the
    * SemDeDup within-cluster shape: bounded as long as k tracks the corpus
    * (auto-k default). The full rewrite doubles as the compaction of the
    * append-accumulated vectors dir. */
  def reconcile(spark: SparkSession, root: String,
                k: Int = 0, iters: Int = 5,
                dupThreshold: Double = 0.95,
                targetClusterSize: Long = 1 << 18): Unit =
    withWriterLock(spark, root) {
      val stored = readOr(spark, s"$root/vectors", vectorsSchema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = stored.count()
        require(n > 0, s"vector lake at $root is empty — nothing to recluster")
        val kk = if (k > 0) k
          else math.max(2, Clustering.autoK(n, targetClusterSize, kMin = 2))
        val cents = Clustering.kmeansCentroids(
          stored, "vec_id", "embedding", kk, iters)
          .orderBy("cluster").collect()
          .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
        require(cents.size >= 2,
          s"recluster collapsed to ${cents.size} centroid(s) — the resident " +
            "vectors are degenerate; raise k or inspect the store")
        val reassigned = Similarity.ivfAssignWithDist(
          stored.select("vec_id", "embedding"), "embedding", cents)
          .select("vec_id", "embedding", "ivf_list", "d2")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
        // near-dup REPAIR under the new assignment (see docstring): same-
        // list pairs, keep the lower id — the maintenance-cadence pass that
        // removes anything a mixed-quantizer ingest window let through
        val ra = reassigned.select(col("ivf_list").as("__la"),
          col("vec_id").as("__ida"), col("embedding").as("__va"))
        val rb = reassigned.select(col("ivf_list").as("__lb"),
          col("vec_id").as("__idb"), col("embedding").as("__vb"))
        val dups = ra.join(rb,
            col("__la") === col("__lb") && col("__ida") < col("__idb"))
          .filter(round(VF.cosine(col("__va"), col("__vb")), 6)
            >= lit(dupThreshold))
          .select(col("__idb").as("vec_id")).distinct()
        val repaired = reassigned.join(dups, Seq("vec_id"), "left_anti")
        // write the rewritten store WITH its list partitioning (the pruning
        // that makes a probe read one list, not the corpus), then promote —
        // plain swapReplace would flatten the layout. The full rewrite IS
        // the compaction, so no separate compact pass is needed.
        repaired.write.mode("overwrite").partitionBy("ivf_list")
          .parquet(s"$root/vectors__tmp")
        Writers.promoteSwap(spark, s"$root/vectors")
        import scala.jdk.CollectionConverters._
        Writers.swapReplace(spark, s"$root/centroids",
          spark.createDataFrame(cents.zipWithIndex
            .map { case (c, i) => org.apache.spark.sql.Row(i, c) }.asJava,
            centroidsSchema))
        } finally { reassigned.unpersist(blocking = false); () }
      } finally { stored.unpersist(blocking = false); () }
    }

  /** The recluster pass as a cron [[Scheduler.Deployment]] — the vector
    * twin of DedupLake's weekly maintenance slot. */
  def maintenanceDeployment(spark: SparkSession, root: String,
                            cron: String = "0 4 * * 0",
                            k: Int = 0, iters: Int = 5): Scheduler.Deployment =
    Scheduler.Deployment("vector_recluster", Scheduler.parse(cron),
      () => reconcile(spark, root, k, iters))
}
