package graft

/** Dev aid: print the executed plan of named queries (all if none given) —
  * the plan-audit loop the scaling notes prescribe after each operator.
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  *
  * With SPARK_GRAFT_EXPLAIN_DIR set, additionally writes each query's
  * `.explain("formatted")` output (the optimization rounds' plan-evidence
  * format) to `$SPARK_GRAFT_EXPLAIN_DIR/<query>_$SPARK_GRAFT_EXPLAIN_TAG.txt`
  * (tag defaults to "plan"). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val tag = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_TAG", "plan")
    outDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    names.foreach { n =>
      println(s"######## $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      outDir match {
        case Some(d) =>
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"${n}_$tag.txt"), formatted)
          println(formatted.linesIterator.take(3).mkString("\n"))
        case None =>
          println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
