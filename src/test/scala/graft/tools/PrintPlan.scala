package graft.tools

/** Local iteration aid: print a registered query's executed plan.
  * Usage: sbt "Test/runMain graft.tools.PrintPlan q108_snapshot_diff" */
object PrintPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    args.foreach { name =>
      println(s"==== $name ====")
      println(graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
