package graft.plans

import graft.SparkSpec
import graft.operators.Dedup
import graft.Tables

/** The composed (no-extensions) physical paths must stay result-identical to
  * the native plan nodes — they're what runs in sessions built without
  * GraftExtensions. */
class FallbackPathsSpec extends SparkSpec {

  private def withNativeOff[T](f: => T): T = {
    spark.conf.set("spark.graft.native.allpairs", "false")
    try f finally spark.conf.set("spark.graft.native.allpairs", "true")
  }

  test("embedding near-dup: composed NLJ fallback equals native node") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val native = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(_.toSeq).toSet
    val composed = withNativeOff {
      Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
        .collect().map(_.toSeq).toSet
    }
    assert(composed == native && native.nonEmpty)
  }

  test("kmeans assignment: HOF fallback equals native NearestCentroid bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def labels() = graft.operators.Clustering
      .kmeansLloyd(emb, "vec_id", "embedding", k = 5, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val native = labels()
    spark.conf.set("spark.graft.native.centroid", "false")
    val hof = try labels()
    finally spark.conf.set("spark.graft.native.centroid", "true")
    assert(native == hof && native.nonEmpty)
  }

  test("bitmap jaccard: composed NLJ fallback equals native node") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2)
      .collect().map(_.toSeq).toSet
    val composed = withNativeOff {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2)
        .collect().map(_.toSeq).toSet
    }
    assert(composed == native && native.nonEmpty)
  }

  test("reviewSummariesMerge: insert-ignore with deterministic first-arrival pick (ST2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val existing = Seq(("r1", 1, "old", 1L)).toDF("recommendationid", "appid", "review", "arrival")
    val incoming = Seq(
      ("r1", 1, "DUP", 2L),
      ("r2", 2, "second-arrival", 4L),
      ("r2", 2, "first-arrival", 3L))
      .toDF("recommendationid", "appid", "review", "arrival")
    val out = graft.streaming.Streams.reviewSummariesMerge(existing, incoming, col("arrival"))
    assert(out.count() == 2)
    assert(out.filter($"recommendationid" === "r1").head().getString(2) == "old")
    // INSERT IGNORE semantics: the FIRST in-batch duplicate wins
    assert(out.filter($"recommendationid" === "r2").head().getString(2) == "first-arrival")
  }
}
