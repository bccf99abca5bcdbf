package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — one place for the engine's session contract:
  * UTC, non-ANSI casts (the parsers' bad-input->NULL semantics), ns-parquet
  * reads, AQE, and the engine's SQL function extensions. */
object GraftSession {
  def builder(cores: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.native.allpairs", "true") // AllPairsStrategy is injected below
      .withExtensions(new plans.GraftExtensions)

  def create(cores: String): SparkSession = {
    val s = builder(cores, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
