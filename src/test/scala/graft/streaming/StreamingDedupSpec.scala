package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming band dedup: first arrival claims the bucket, replays flagged") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.BandedDoc]
    val q = Streams.streamingBandDedup(input.toDS())
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      // doc 1 arrives first with bands A,B; doc 2 shares band A (near-dup)
      input.addData(
        Streams.BandedDoc(1L, 0, "A"), Streams.BandedDoc(1L, 1, "B"),
        Streams.BandedDoc(2L, 0, "A"), Streams.BandedDoc(2L, 1, "C"))
      q.processAllAvailable()
      // doc 3 in a later batch shares band C with doc 2; doc 4 is fresh
      input.addData(
        Streams.BandedDoc(3L, 1, "C"), Streams.BandedDoc(3L, 0, "D"),
        Streams.BandedDoc(4L, 0, "E"), Streams.BandedDoc(4L, 1, "F"))
      q.processAllAvailable()
      val verdicts = spark.table("sdedup").as[Streams.DedupVerdict].collect()
      // a doc is a duplicate iff ANY of its bands was already claimed
      val isDup = verdicts.groupBy(_.doc_id)
        .view.mapValues(_.exists(_.is_duplicate)).toMap
      assert(isDup == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false))
    } finally q.stop()
  }

  test("band construction from documents feeds the streaming filter") {
    // batch-side banding via the same signature/band code as the batch LSH
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "completely different words entirely")).toDF("doc_id", "text")
    val sig = graft.operators.Dedup.minhashSignature(docs, "doc_id", "text", 8, 2)
    import org.apache.spark.sql.functions._
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", col(s"h${b * 2}"), col(s"h${b * 2 + 1}"))).as("band_hash"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
      .as[Streams.BandedDoc]
    // identical docs produce identical band hashes
    val byDoc = banded.collect().groupBy(_.doc_id).view.mapValues(_.map(_.band_hash).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L) != byDoc(3L))
  }
}
