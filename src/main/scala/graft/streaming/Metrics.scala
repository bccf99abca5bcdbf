package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** S20 metrics sink, Spark-native: the reference pushes counters/histograms
  * to a Prometheus pushgateway (monitoring/metrics.py:18-159); the engine
  * equivalents are `df.observe` metrics evaluated inline with the job (no
  * second pass) and a StreamingQueryListener forwarding per-batch progress.
  * The export edge (pushgateway HTTP) stays behind a seam like S19. */
object Metrics {

  /** Inline observable metrics on any batch/stream DataFrame: row count and
    * per-column null counts — the reference's processed/failed counters. */
  def observed(df: DataFrame, name: String, watchedCols: Seq[String]): DataFrame = {
    val nullCounts = watchedCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    df.observe(name, count(lit(1)).as("rows"), nullCounts: _*)
  }

  trait MetricsSink extends Serializable {
    def push(metric: String, value: Double, labels: Map[String, String]): Unit
  }

  /** Forward streaming progress (rows/sec, batch duration, state rows) to a
    * sink per micro-batch — what the Grafana dashboard graphed. */
  def listener(sink: MetricsSink): StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val labels = Map("query" -> Option(p.name).getOrElse(p.id.toString))
      sink.push("input_rows_per_second", p.inputRowsPerSecond, labels)
      sink.push("processed_rows_per_second", p.processedRowsPerSecond, labels)
      sink.push("num_input_rows", p.numInputRows.toDouble, labels)
      // batch duration + state size — without these the dedup operators'
      // state growth (the thing the TTL variants bound) is unobservable
      Option(p.durationMs.get("triggerExecution"))
        .foreach(d => sink.push("batch_duration_ms", d.toDouble, labels))
      if (p.stateOperators != null && p.stateOperators.nonEmpty)
        sink.push("state_rows_total",
          p.stateOperators.map(_.numRowsTotal).sum.toDouble, labels)
    }
  }

  def register(spark: SparkSession, sink: MetricsSink): StreamingQueryListener = {
    val l = listener(sink)
    spark.streams.addListener(l)
    l
  }

  /** In-memory metrics registry rendering the Prometheus TEXT EXPOSITION
    * format — the PUBLIC wire format a pushgateway PUT carries and a
    * /metrics scrape returns (what the reference's prometheus.yml scrapes
    * every 10 s and the Grafana dashboard graphs). This closes the metrics
    * seam to its sandbox limit: the payload is byte-ready; only the HTTP
    * edge stays out (zero egress). Series render sorted, label values
    * escaped per spec (backslash, double-quote, newline), integral values
    * without a trailing `.0` — deterministic output, diffable in tests. */
  final class PrometheusRegistry(job: String = "graft") extends MetricsSink {
    private val series =
      scala.collection.mutable.Map[(String, List[(String, String)]), Double]()

    def push(metric: String, value: Double, labels: Map[String, String]): Unit =
      synchronized { series((metric, labels.toList.sortBy(_._1))) = value }

    private def esc(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

    private def num(d: Double): String =
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

    /** The exposition payload. Every series carries the `job` label the
      * pushgateway would add to its grouping key. */
    def expose(): String = synchronized {
      val byMetric = series.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      byMetric.map { case (metric, rows) =>
        val lines = rows.sortBy(_._1._2.toString).map { case ((_, labels), v) =>
          // duplicate label names are invalid exposition — a caller-supplied
          // job label wins over the registry default instead of doubling it
          val withJob = if (labels.exists(_._1 == "job")) labels
                        else ("job" -> job) :: labels
          val all = withJob.map { case (k, x) => s"""$k="${esc(x)}"""" }
          s"$metric{${all.mkString(",")}} ${num(v)}"
        }
        // prometheus naming convention: *_total series are counters
        val kind = if (metric.endsWith("_total")) "counter" else "gauge"
        s"# TYPE $metric $kind\n" + lines.mkString("\n")
      }.mkString("", "\n", "\n")
    }
  }
}
