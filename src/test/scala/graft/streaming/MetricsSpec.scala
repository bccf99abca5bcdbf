package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("encodeJson -> decodeJson round-trips the wire format (S16/S17)") {
    val df = Seq((1, "a", 9.5), (2, null.asInstanceOf[String], 1.0)).toDF("k", "s", "v")
    val wire = Streams.encodeJson(df)
    assert(wire.columns.toSeq == Seq("value"))
    val back = Streams.decodeJson(wire, df.schema)
    assert(sortedRows(back) == sortedRows(df))
  }

  test("epoch millis -> timestamp (F7, Debezium after.timestamp/1000)") {
    val out = Seq(1700000000123L).toDF("ms")
      .select(timestamp_millis(col("ms")).as("ts")).head().getTimestamp(0)
    assert(out.toInstant.toEpochMilli == 1700000000123L)
  }

  test("observed metrics report row and null counts inline (S20/A7)") {
    val df = Seq(("a", Some(1)), ("b", None), ("c", Some(3))).toDF("k", "v")
    val observed = Metrics.observed(df, "ingest", Seq("v"))
    observed.collect() // count() would plan a separate queryExecution
    val row = observed.queryExecution.observedMetrics("ingest")
    assert(row.getAs[Long]("rows") == 3L)
    assert(row.getAs[Long]("v_nulls") == 1L)
  }

  test("streaming listener forwards per-batch progress to the sink (S20)") {
    implicit val sqlCtx = spark.sqlContext
    val pushed = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val sink = new Metrics.MetricsSink {
      def push(metric: String, value: Double, labels: Map[String, String]): Unit =
        pushed.synchronized { pushed += (metric -> value); () }
    }
    val l = Metrics.register(spark, sink)
    val input = MemoryStream[Int]
    val q = input.toDS().writeStream.format("memory")
      .queryName("metrics_out").outputMode("append").start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      // listener bus is async AND a zero-row batch progress may arrive before
      // the data batch's — wait for the condition, not for the first event
      def sawRows() = pushed.synchronized(
        pushed.exists { case (m, v) => m == "num_input_rows" && v >= 3.0 })
      val deadline = System.currentTimeMillis + 30000
      while (!sawRows() && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(sawRows(), s"pushed=${pushed.synchronized(pushed.toList)}")
    } finally {
      q.stop()
      spark.streams.removeListener(l)
    }
  }

  test("PrometheusRegistry renders the text exposition format, sorted and escaped") {
    val reg = new Metrics.PrometheusRegistry(job = "steam")
    reg.push("steam_reviews_inserted_total", 123.0, Map("table" -> "reviews"))
    reg.push("steam_reviews_inserted_total", 7.0, Map("table" -> "prices"))
    reg.push("batch_seconds", 0.25, Map("query" -> "line1\nwith \"quotes\" \\ slash"))
    assert(reg.expose() ===
      """# TYPE batch_seconds gauge
        |batch_seconds{job="steam",query="line1\nwith \"quotes\" \\ slash"} 0.25
        |# TYPE steam_reviews_inserted_total counter
        |steam_reviews_inserted_total{job="steam",table="prices"} 7
        |steam_reviews_inserted_total{job="steam",table="reviews"} 123
        |""".stripMargin)
    // a re-push overwrites the series (gauge semantics), never duplicates it
    reg.push("steam_reviews_inserted_total", 130.0, Map("table" -> "reviews"))
    assert(reg.expose().contains("""table="reviews"} 130""") &&
      !reg.expose().contains("} 123"))
    // a caller-supplied job label replaces the default — duplicate label
    // names would invalidate the whole exposition
    reg.push("x_rows", 1.0, Map("job" -> "etl"))
    assert(reg.expose().contains("""x_rows{job="etl"} 1""") &&
      !reg.expose().contains("""x_rows{job="steam""""))
  }
}
