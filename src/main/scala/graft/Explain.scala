package graft

/** Dev aid: print the executed plan of named queries (all if none given) —
  * the plan-audit loop the scaling notes prescribe after each operator.
  * Usage: runMain graft.Explain <sfDir> [queryName...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    names.foreach { n =>
      println(s"######## $n")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
