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
    }
  }

  def register(spark: SparkSession, sink: MetricsSink): StreamingQueryListener = {
    val l = listener(sink)
    spark.streams.addListener(l)
    l
  }
}
