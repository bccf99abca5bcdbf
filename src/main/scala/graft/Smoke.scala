package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a default-config session (Spark 4 defaults,
  * ANSI on — NOT our tuned Verify session) calling SparkEntry.entry, checking
  * rows > 0. Run: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, truncate = false)
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
