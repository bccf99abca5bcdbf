package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Parity pin for the transformWithState twin of monotoneDedup: same event
  * sequences, same emissions, across batches. transformWithState requires the
  * RocksDB state store provider, so each test swaps it in and restores. */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("monotoneDedupTws matches monotoneDedup across batches (hwm parity)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Streams.CdcChange]
      val q = Streams.monotoneDedupTws(input.toDS())
        .writeStream.format("memory").queryName("tws_mono").outputMode("append").start()
      try {
        // batch 1: increasing chain for key 1 -> both out; key 2 single
        input.addData(
          Streams.CdcChange(1, 100.0, 10, 9, 0, 10),
          Streams.CdcChange(1, 200.0, 9, 8, 10, 20),
          Streams.CdcChange(2, 50.0, 5, 4, 0, 0))
        q.processAllAvailable()
        // batch 2: stale replay for key 1 (ts <= hwm) dropped; fresh kept
        input.addData(
          Streams.CdcChange(1, 150.0, 0, 0, 0, 0), // stale: 150 <= 200
          Streams.CdcChange(1, 300.0, 8, 7, 20, 30),
          Streams.CdcChange(2, 50.0, 5, 4, 0, 0)) // exact replay dropped
        q.processAllAvailable()
        val out = spark.table("tws_mono").as[Streams.CdcChange].collect()
          .map(c => (c.game_id, c.ts)).toSet
        assert(out == Set((1, 100.0), (1, 200.0), (1, 300.0), (2, 50.0)))
      } finally q.stop()
    }
  }

  test("monotoneDedupTws batch-internal ordering matches the GroupState form") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Streams.CdcChange]
      val q = Streams.monotoneDedupTws(input.toDS())
        .writeStream.format("memory").queryName("tws_order").outputMode("append").start()
      try {
        // one batch, out-of-order arrivals: processed in ts order, so the
        // lower-ts event still precedes and both pass the rising hwm
        input.addData(
          Streams.CdcChange(7, 300.0, 1, 2, 0, 0),
          Streams.CdcChange(7, 100.0, 3, 4, 0, 0),
          Streams.CdcChange(7, 100.0, 0, 1, 0, 0)) // ts tie: only lower new_price emits once hwm rises
        q.processAllAvailable()
        val out = spark.table("tws_order").as[Streams.CdcChange].collect()
          .sortBy(_.ts).map(c => (c.ts, c.new_price)).toSeq
        // ties on ts: sorted by (ts, new_price); first claims hwm=100, the
        // second 100.0 is dropped; then 300 passes — exactly monotoneDedup
        assert(out == Seq((100.0, 1.0), (300.0, 2.0)))
      } finally q.stop()
    }
  }

  test("streamingBandDedupTws matches streamingBandDedup verdicts") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Streams.BandedDoc]
      val q = Streams.streamingBandDedupTws(input.toDS())
        .writeStream.format("memory").queryName("tws_band").outputMode("append").start()
      try {
        input.addData(
          Streams.BandedDoc(1L, 0, "A"), Streams.BandedDoc(1L, 1, "B"),
          Streams.BandedDoc(2L, 0, "A"), Streams.BandedDoc(2L, 1, "C"))
        q.processAllAvailable()
        input.addData(
          Streams.BandedDoc(3L, 1, "C"), Streams.BandedDoc(3L, 0, "D"),
          Streams.BandedDoc(4L, 0, "E"), Streams.BandedDoc(4L, 1, "F"))
        q.processAllAvailable()
        val verdicts = spark.table("tws_band").as[Streams.DedupVerdict].collect()
        // same sequences, same verdicts as the GroupState form's spec
        val isDup = verdicts.groupBy(_.doc_id)
          .view.mapValues(_.exists(_.is_duplicate)).toMap
        assert(isDup == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false))
      } finally q.stop()
    }
  }

  test("monotoneDedupTws state survives query restart from checkpoint") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("tws_ckpt").toString
      val input = MemoryStream[Streams.CdcChange]
      // memory sink refuses checkpoint recovery; foreachBatch supports it
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Double]
      def start() = Streams.monotoneDedupTws(input.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.CdcChange], _: Long) =>
          emitted.synchronized { emitted ++= df.collect().map(_.ts) }; ()
        }.start()
      val q1 = start()
      try {
        input.addData(Streams.CdcChange(1, 500.0, 1, 2, 0, 0))
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start()
      try {
        // after restart the hwm=500 must persist: a stale replay stays dropped
        input.addData(
          Streams.CdcChange(1, 400.0, 0, 0, 0, 0),
          Streams.CdcChange(1, 600.0, 2, 3, 0, 0))
        q2.processAllAvailable()
        val out = emitted.synchronized(emitted.toSet)
        assert(out == Set(500.0, 600.0), s"hwm lost across restart: $out")
      } finally q2.stop()
    }
  }
}
