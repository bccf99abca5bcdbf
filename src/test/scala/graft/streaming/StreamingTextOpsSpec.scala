package graft.streaming

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import graft.operators.TextStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation operators are stateless narrow plans, so the SAME operator
  * code runs on a stream unchanged — this pins batch/stream parity for the
  * round-3 ops (chunking, rolling hash, quality/langid scoring). A stream
  * is how a crawl actually delivers documents (reference: the price/review
  * consumers), so parity here means the curation layer needs no batch
  * re-run to match offline results. */
class StreamingTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the the the the the the the the"),
    (3L, "der hund und die katze und der vogel"),
    (4L, "x"),
    (5L, "")).toDF("doc_id", "text")

  private def streamed(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                       name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = transform(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(1L -> "the quick brown fox jumps over the lazy dog again and again",
        2L -> "the the the the the the the the")
      q.processAllAvailable()
      input.addData(3L -> "der hund und die katze und der vogel", 4L -> "x", 5L -> "")
      q.processAllAvailable()
      spark.table(name).collect().toSet
    } finally q.stop()
  }

  test("chunkTokens: identical rows on stream and batch") {
    val f = (df: org.apache.spark.sql.DataFrame) =>
      TextStats.chunkTokens(df, "doc_id", "text", chunkSize = 4, stride = 3)
    assert(streamed(f, "chunk_stream") == f(docs).collect().toSet)
  }

  test("rollingHash: identical rows on stream and batch (the operator itself streams)") {
    val f = (df: org.apache.spark.sql.DataFrame) =>
      TextStats.rollingHash(df, "doc_id", "text")
    assert(streamed(f, "rh_stream") == f(docs).collect().toSet)
  }

  test("quality + langid scoring: identical rows on stream and batch") {
    val f = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"),
        TF.qualityScore(col("text")).as("q"), TF.langId(col("text")).as("lang"))
    assert(streamed(f, "ql_stream") == f(docs).collect().toSet)
  }

  test("gopherRules: identical rows on stream and batch (pure scan, streams as-is)") {
    val f = (df: org.apache.spark.sql.DataFrame) =>
      TextStats.gopherRules(df, "doc_id", "text", minWords = 5, maxWords = 100)
    assert(streamed(f, "gopher_stream") == f(docs).collect().toSet)
  }
}
