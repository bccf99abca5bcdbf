package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** HYBRID retrieval over the LAKE-RESIDENT indexes — the full serving
  * endpoint the per-query pure forms (q163) prototype: one probe batch
  * carrying (probe_id, embedding, terms) fans into the vector lake's
  * partition-pruned IVF serve and the lex lake's bucket-pruned BM25 serve,
  * and the two per-probe lists fuse by reciprocal-rank in exact integer
  * micros ([[Similarity.rrfFuseAll]]). Everything after the two pruned
  * scans is serving-bounded: probes × (kVec + nLex) rows into one
  * full-outer fold + rank window. A probe whose terms miss the corpus
  * serves vector-only; a probe with no vector neighbors serves
  * lexical-only — the fusion's absence arms, inherited.
  *
  * READER path on both lakes: no leases, each lake's generation resolved
  * once inside its own serve — the two stores version independently (they
  * are separate indexes over one id space, the [[LakeSync]] contract). */
object Retrieval {

  def hybridServe(spark: SparkSession, vectorRoot: String, lexRoot: String,
                  probes: DataFrame, k: Int,
                  kVec: Int = 10, nLex: Int = 10,
                  nprobe: Int = 2, kRrf: Int = 60,
                  probeId: String = "probe_id",
                  vecCol: String = "embedding", termsCol: String = "terms",
                  quantized: Boolean = false,
                  refineFactor: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // pinned: both arms evaluate the probe frame independently — an
    // unpinned non-deterministic source could serve one probe set to the
    // vector arm and another to the lexical arm (the searchBatch pinning
    // rationale, doubled)
    val p = probes.select(col(probeId).cast("long").as("probe_id"),
      col(vecCol), col(termsCol)).localCheckpoint(true)
    val vec = VectorLake.searchBatch(spark, vectorRoot, p, kVec, nprobe,
        probeId = "probe_id", probeVec = vecCol,
        quantized = quantized, refineFactor = refineFactor)
      .select("probe_id", "neighbor_id", "rank")
    val lex = LexLake.serve(spark, lexRoot, p, nLex,
        queryIdCol = "probe_id", termsCol = termsCol)
      .select(col("probe_id"), col("doc_id").as("neighbor_id"), col("rank"))
    Similarity.rrfFuseAll(Seq(vec, lex), k, kRrf)
  }
}
