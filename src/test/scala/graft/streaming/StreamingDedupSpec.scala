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

  test("streamingBandDedupTtl: buckets evict after event-time TTL; within-window verdicts unchanged") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[Streams.TimedBandedDoc]
    val q = Streams.streamingBandDedupTtl(input.toDS(),
      watermarkDelay = "10 minutes", stateTtl = java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("sdedup_ttl").outputMode("append").start()
    try {
      // within the window: same verdicts as the non-TTL form
      input.addData(
        Streams.TimedBandedDoc(1L, 0, "A", t("2024-01-01 10:00:00")),
        Streams.TimedBandedDoc(1L, 1, "B", t("2024-01-01 10:00:00")),
        Streams.TimedBandedDoc(2L, 0, "A", t("2024-01-01 10:00:00")),
        Streams.TimedBandedDoc(2L, 1, "C", t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance the watermark well past bucket timeouts (10:00 + 30 min)
      input.addData(Streams.TimedBandedDoc(90L, 0, "Z", t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // one more batch so the expired buckets take their timeout call
      input.addData(Streams.TimedBandedDoc(91L, 0, "Y", t("2024-01-01 12:10:00")))
      q.processAllAvailable()
      // bucket A was evicted -> a later arrival claims it fresh
      input.addData(Streams.TimedBandedDoc(3L, 0, "A", t("2024-01-01 12:20:00")))
      q.processAllAvailable()
      val verdicts = spark.table("sdedup_ttl").as[Streams.DedupVerdict].collect()
      val isDup = verdicts.groupBy(_.doc_id)
        .view.mapValues(_.exists(_.is_duplicate)).toMap
      assert(isDup(1L) == false && isDup(2L) == true) // within-window unchanged
      assert(isDup(3L) == false) // post-eviction arrival is fresh
    } finally q.stop()
  }

  test("streamingBandDedupTtl: an older-event-time duplicate cannot shorten a bucket's retention") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[Streams.TimedBandedDoc]
    val q = Streams.streamingBandDedupTtl(input.toDS(),
      watermarkDelay = "2 hours", stateTtl = java.time.Duration.ofMinutes(60))
      .writeStream.format("memory").queryName("sdedup_ttl_mono").outputMode("append").start()
    try {
      // bucket A claimed at 10:00 -> retention anchored at 11:00
      input.addData(Streams.TimedBandedDoc(1L, 0, "A", t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // a LATER batch carrying only an OLDER duplicate (09:50, inside the
      // watermark) must not move the timeout back to 10:50
      input.addData(Streams.TimedBandedDoc(2L, 0, "A", t("2024-01-01 09:50:00")))
      q.processAllAvailable()
      // watermark advances to 10:55 (12:55 - 2h): past the 10:50 a
      // batch-max anchor would have set, NOT past the monotone 11:00
      input.addData(Streams.TimedBandedDoc(90L, 0, "Z", t("2024-01-01 12:55:00")))
      q.processAllAvailable()
      input.addData(Streams.TimedBandedDoc(91L, 0, "Y", t("2024-01-01 12:56:00")))
      q.processAllAvailable()
      // bucket A must STILL be claimed (monotone anchor 11:00 > watermark
      // 10:56; the buggy batch-max anchor 10:50 would have evicted it) ->
      // this arrival is a duplicate. 11:30 keeps the row above the watermark
      input.addData(Streams.TimedBandedDoc(3L, 0, "A", t("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val isDup = spark.table("sdedup_ttl_mono").as[Streams.DedupVerdict].collect()
        .groupBy(_.doc_id).view.mapValues(_.exists(_.is_duplicate)).toMap
      assert(isDup(1L) == false && isDup(2L) == true)
      assert(isDup(3L) == true, "retention was shortened by the older duplicate")
    } finally q.stop()
  }

  test("monotoneDedupTtl: state rows evict after TTL with output identical to non-TTL form") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.CdcChange]
    val q = Streams.monotoneDedupTtl(input.toDS(),
      watermarkDelay = "10 minutes", stateTtl = java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("mono_ttl").outputMode("append").start()
    try {
      input.addData(
        Streams.CdcChange(1, ts = 99000.0, 99, 99, 0, 0),
        Streams.CdcChange(1, ts = 100000.0, 10, 9, 0, 10)) // increasing chain: both emitted
      q.processAllAvailable()
      // watermark to 103000-600 s, beyond key 1's timeout (100000+1800 s)
      input.addData(Streams.CdcChange(2, ts = 103000.0, 1, 2, 0, 0))
      q.processAllAvailable()
      // expired key 1 takes its timeout call in this batch
      input.addData(Streams.CdcChange(3, ts = 103100.0, 1, 2, 0, 0))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 2, s"key 1 should be evicted, state rows = $stateRows")
      val out = spark.table("mono_ttl").as[Streams.CdcChange].collect()
      // output identical to the non-TTL semantics
      assert(out.map(c => (c.game_id, c.ts)).toSet ==
        Set((1, 99000.0), (1, 100000.0), (2, 103000.0), (3, 103100.0)))
    } finally q.stop()
  }

  test("streaming dedup state runs on the RocksDB store provider (scale config)") {
    // at 100 TB the dedup state outgrows the default HDFS-backed in-memory
    // store; RocksDB spills to local disk with incremental checkpointing —
    // prove the operator works unchanged on it and the provider engages
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Streams.BandedDoc]
      val q = Streams.streamingBandDedup(input.toDS())
        .writeStream.format("memory").queryName("sdedup_rocks").outputMode("append").start()
      try {
        input.addData(Streams.BandedDoc(1L, 0, "A"), Streams.BandedDoc(2L, 0, "A"))
        q.processAllAvailable()
        val v = spark.table("sdedup_rocks").as[Streams.DedupVerdict].collect()
        assert(v.map(d => d.doc_id -> d.is_duplicate).toMap == Map(1L -> false, 2L -> true))
        val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
        assert(metrics.toString.contains("rocksdb"), s"provider not engaged: $metrics")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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
