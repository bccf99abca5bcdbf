package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def kafkaish(msgs: Seq[String]) = msgs.toDF("value")

  test("decodePriceTicks: type dispatch, validity filter, money parse (ST1 ingress)") {
    val out = Streams.decodePriceTicks(kafkaish(Seq(
      """{"type":"price","appid":10,"discount":"50","price":"9,99","initial_price":"19,99","timestamp":1700000000.0}""",
      """{"type":"review","appid":10,"discount":"0","price":"1,00","initial_price":"1,00","timestamp":1700000001.0}""",
      """{"type":"price","appid":11,"discount":"0","price":null,"initial_price":"1,00","timestamp":1700000002.0}""",
      """not json at all""")))
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("price_cents") == 999L)
    assert(rows(0).getAs[Double]("discount") == 50.0)
  }

  test("decodeCdc + cdcChanged: inserts skipped, no-op updates skipped (ST4)") {
    val msgs = kafkaish(Seq(
      // insert: before null -> no notify
      """{"payload":{"before":null,"after":{"game_id":1,"discount":0,"price":9.99,"initial_price":9.99,"timestamp":1.7e12}}}""",
      // real change
      """{"payload":{"before":{"game_id":2,"discount":0,"price":19.99,"initial_price":19.99,"timestamp":1.6e12},"after":{"game_id":2,"discount":50,"price":9.99,"initial_price":19.99,"timestamp":1.7e12}}}""",
      // no-op
      """{"payload":{"before":{"game_id":3,"discount":0,"price":5.0,"initial_price":5.0,"timestamp":1.6e12},"after":{"game_id":3,"discount":0,"price":5.0,"initial_price":5.0,"timestamp":1.7e12}}}""",
      // null -> value transition in one compared field is a change (null-safe compare)
      """{"payload":{"before":{"game_id":4,"discount":0,"price":null,"initial_price":5.0,"timestamp":1.6e12},"after":{"game_id":4,"discount":0,"price":5.0,"initial_price":5.0,"timestamp":1.7e12}}}"""))
    val changed = Streams.cdcChanged(Streams.decodeCdc(msgs))
    assert(changed.select("after.game_id").as[Int].collect().toSeq.sorted == Seq(2, 4))
  }

  test("monotoneDedup drops stale replays across micro-batches (ST4/ST9)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.CdcChange]
    val q = Streams.monotoneDedup(input.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        Streams.CdcChange(1, ts = 100.0, 10, 9, 0, 10),
        Streams.CdcChange(1, ts = 200.0, 9, 8, 10, 20))
      q.processAllAvailable()
      // replay of ts=200 and an older ts=150 both must be dropped
      input.addData(
        Streams.CdcChange(1, ts = 200.0, 9, 8, 10, 20),
        Streams.CdcChange(1, ts = 150.0, 99, 99, 0, 0),
        Streams.CdcChange(1, ts = 300.0, 8, 7, 20, 30),
        Streams.CdcChange(2, ts = 50.0, 1, 2, 0, 0))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[Streams.CdcChange].collect()
      assert(out.map(c => (c.game_id, c.ts)).toSet ==
        Set((1, 100.0), (1, 200.0), (1, 300.0), (2, 50.0)))
    } finally q.stop()
  }

  test("priceBatchMerge: auto-insert missing games, GREATEST state merge (ST1)") {
    val games = Seq(1, 2).toDF("game_id")
    val state = Seq((1, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
      .toDF("game_appid", "last_review_timestamp", "last_price_timestamp")
    val ticks = Seq(
      (1, 999L, 0.0, 999L, ts("2024-01-03 00:00:00")),  // older than state -> state keeps 01-05
      (3, 499L, 50.0, 999L, ts("2024-01-06 00:00:00"))) // new game
      .toDF("appid", "price_cents", "discount", "initial_price_cents", "ts")
    val (missing, appended, merged) = Streams.priceBatchMerge(games, state, ticks)
    assert(missing.as[Int].collect().toSeq == Seq(3))
    assert(appended.count() == 2)
    val m = merged.orderBy("game_appid").collect()
    assert(m(0).getTimestamp(2) == ts("2024-01-05 00:00:00")) // GREATEST kept old
    assert(m(1).getInt(0) == 3 && m(1).getTimestamp(2) == ts("2024-01-06 00:00:00"))
  }

  test("reviewBatchMerge: upsert-dedup by (appid, author_steamid) keep newest (ST3/S15)") {
    val existing = Seq((1, "s1", "old text", ts("2024-01-01 00:00:00")))
      .toDF("appid", "author_steamid", "review", "review_timestamp")
    val incoming = Seq(
      (1, "s1", "updated", ts("2024-01-02 00:00:00")),
      (1, "s1", "older dup in batch", ts("2024-01-01 12:00:00")),
      (2, "s2", "new", ts("2024-01-01 00:00:00")))
      .toDF("appid", "author_steamid", "review", "review_timestamp")
    val out = Streams.reviewBatchMerge(existing, incoming)
    assert(out.count() == 2)
    assert(out.filter(col("appid") === 1).head().getAs[String]("review") == "updated")
  }

  test("reviewBatchMerge: replayed old batch cannot regress a newer existing row") {
    val existing = Seq((1, "s1", "newest", ts("2024-02-01 00:00:00")))
      .toDF("appid", "author_steamid", "review", "review_timestamp")
    val staleReplay = Seq((1, "s1", "stale", ts("2024-01-01 00:00:00")))
      .toDF("appid", "author_steamid", "review", "review_timestamp")
    val out = Streams.reviewBatchMerge(existing, staleReplay)
    assert(out.count() == 1)
    assert(out.head().getAs[String]("review") == "newest")
    // equal timestamps: incoming side wins (upsert replace-on-conflict)
    val sameTs = Seq((1, "s1", "rewrite", ts("2024-02-01 00:00:00")))
      .toDF("appid", "author_steamid", "review", "review_timestamp")
    assert(Streams.reviewBatchMerge(existing, sameTs)
      .head().getAs[String]("review") == "rewrite")
  }

  test("windowedCounts: event-time tumbling windows via streaming (extension)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedCounts(events, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "click", 1.0),
        (ts("2024-01-01 00:02:00"), "click", 2.0),
        (ts("2024-01-01 00:07:00"), "view", 5.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 01:00:00"), "click", 1.0)) // advances watermark
      q.processAllAvailable()
      val out = spark.table("win_out")
      assert(out.filter(col("event_type") === "click").head().getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("sessionCounts: gap-based session windows close at the watermark (q50 streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Int, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = Streams.sessionCounts(events, "ts", "user_id",
      watermark = "10 minutes", gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then one 2 h later
      input.addData(
        (ts("2024-01-01 00:00:00"), 1, 1.0),
        (ts("2024-01-01 00:05:00"), 1, 2.0),
        (ts("2024-01-01 02:00:00"), 1, 4.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 05:00:00"), 2, 0.0)) // advance watermark
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .select(col("user_id"), col("n_events"), col("session_value")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.contains((1, 2L, 3.0))) // first session: both events merged
      assert(out.contains((1, 1L, 4.0))) // 2 h gap opened a second session
    } finally q.stop()
  }

  test("wireSource/wireSink: jar-less env probes false and round-trips via fallback (S16/S17)") {
    implicit val sqlCtx = spark.sqlContext
    assert(!Streams.kafkaAvailable) // /opt/spark/jars ships no spark-sql-kafka
    val dir = java.nio.file.Files.createTempDirectory("wire").toString
    val ck1 = java.nio.file.Files.createTempDirectory("wk1").toString
    val input = MemoryStream[(Int, String)]
    val encoded = Streams.encodeJson(input.toDF().toDF("appid", "kind"))
    val qOut = Streams.wireSink(encoded, "prices", "unused:9092", dir, ck1).start()
    try {
      input.addData((1, "price"), (2, "price"))
      qOut.processAllAvailable()
    } finally qOut.stop()
    // consume the produced wire files through the source half
    val src = Streams.wireSource(spark, "prices", "unused:9092", dir)
    val decoded = Streams.decodeJson(src, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("appid", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType))))
    val qIn = decoded.writeStream.format("memory").queryName("wire_rt").outputMode("append").start()
    try {
      qIn.processAllAvailable()
      assert(spark.table("wire_rt").collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set((1, "price"), (2, "price")))
    } finally qIn.stop()
  }

  test("wireSource/wireSink kafka branch: option maps + format selection (S16/S17)") {
    // The option-map contract is pure — pinned here byte-for-byte so a broker
    // deployment gets exactly the reference's subscription semantics
    assert(Streams.kafkaSourceOptions("prices", "b:9092") == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "prices",
      "startingOffsets" -> "earliest"))
    assert(Streams.kafkaSinkOptions("prices", "b:9092", "/ck") == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "prices",
      "checkpointLocation" -> "/ck"))
    // Forcing useKafka=true executes the kafka BRANCH (format string + option
    // binding) down to Spark's source resolution, which on this jar-less
    // classpath must fail looking for the kafka provider — proof the branch
    // selected .format("kafka"), not the fallback
    val e = intercept[Exception] {
      Streams.wireSource(spark, "prices", "b:9092", "/tmp/na", useKafka = true)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
    // sink half: the writer is constructed lazily; failure surfaces at start()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, String)]
    val encoded = Streams.encodeJson(input.toDF().toDF("appid", "kind"))
    val ck = java.nio.file.Files.createTempDirectory("wk-kafka").toString
    val e2 = intercept[Exception] {
      val q = Streams.wireSink(encoded, "prices", "b:9092", "/tmp/na", ck,
        useKafka = true).start()
      try { input.addData((1, "price")); q.processAllAvailable() } finally q.stop()
    }
    assert(e2.getMessage.toLowerCase.contains("kafka"), e2.getMessage)
  }

  test("streamJoinWithin: stream-stream join bounded by event-time skew") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Int, java.sql.Timestamp)]
    val buys = MemoryStream[(Int, java.sql.Timestamp, Double)]
    val joined = Streams.streamJoinWithin(
      buys.toDF().toDF("b_user", "b_ts", "amount"), "b_user", "b_ts",
      clicks.toDF().toDF("c_user", "c_ts"), "c_user", "c_ts",
      watermark = "10 minutes", within = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1, ts("2024-01-01 00:00:00")),  // within 30 min of the purchase
        (1, ts("2024-01-01 02:00:00")),  // AFTER the purchase -> excluded
        (2, ts("2024-01-01 00:00:00")))  // 3 h before purchase -> excluded
      buys.addData(
        (1, ts("2024-01-01 00:20:00"), 9.99),
        (2, ts("2024-01-01 03:00:00"), 5.00))
      q.processAllAvailable()
      val out = spark.table("ssj_out")
        .select("b_user", "c_ts").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1))).toSet
      assert(out == Set((1, ts("2024-01-01 00:00:00"))))
    } finally q.stop()
  }

  test("notifyBatch drives the webhook seam with a stub (S19)") {
    val changes = Seq(Streams.CdcChange(1, 100.0, 10, 9, 0, 10),
      Streams.CdcChange(2, 100.0, 5, 4, 0, 10)).toDS()
    val sent = Streams.notifyBatch(changes, new Streams.Notifier {
      def notify(gameId: Int, oldPrice: Double, newPrice: Double): Boolean = gameId == 1
    })
    assert(sent == 1L)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
