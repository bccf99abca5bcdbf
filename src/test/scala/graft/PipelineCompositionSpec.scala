package graft

import org.apache.spark.sql.functions._

/** End-to-end invariants of the q75 training-pipeline composition that the
  * synthetic corpus cannot exercise (it has no short documents), run against
  * a purpose-built documents table. */
class PipelineCompositionSpec extends SparkSpec {
  import spark.implicits._

  private def runPipeline(rows: Seq[(Long, String)]): Array[(Long, String)] = {
    val dir = java.nio.file.Files.createTempDirectory("pipe")
    // q75 persists its clean subtree and the cluster loop pins per-round
    // RDDs; release ONLY what this run materialized — a blanket clearCache
    // would evict caches other suites sharing the session have built
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    try {
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("q75_training_pipeline")(spark, dir.toString)
        .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1)))
    } finally {
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => cachedBefore(id) }
        .values.foreach(_.unpersist(blocking = false))
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  // prose-y filler that passes the en-langid and quality gates
  private val good = "the data and the table of the rows is that it for the " +
    "scan and the merge of the batch is that it for the query and the join"

  test("identical SHORT docs (no bigrams -> no LSH bands) still dedup via the exact stage") {
    // "the" alone: 1 token -> zero bigram shingles -> invisible to banding
    val out = runPipeline(Seq(
      10L -> "the", 11L -> "the", 12L -> "the",
      20L -> good))
    val kept = out.map(_._1).distinct.sorted
    // only the min-id short doc survives; the near-dup path never saw them
    assert(kept.contains(10L) && !kept.contains(11L) && !kept.contains(12L), kept.toSeq)
    assert(kept.contains(20L))
  }

  test("near-dup cluster keeps exactly the min-id representative; chunks carry its split") {
    val out = runPipeline(Seq(
      5L -> good, 6L -> good, 7L -> (good + " extra"),
      9L -> (good.replace("data", "sort"))))
    val kept = out.map(_._1).distinct.sorted
    // 5,6 are exact dups; 7 differs by one token -> same LSH cluster as 5
    assert(kept.contains(5L) && !kept.contains(6L) && !kept.contains(7L), kept.toSeq)
    // every chunk row of a doc carries one consistent split label
    assert(out.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1))
  }
}
