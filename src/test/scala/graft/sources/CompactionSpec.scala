package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compact collapses a small-file tail without changing values") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartition(20).write.parquet(dir)
    assert(parquetFiles(dir).size == 20)
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet

    Writers.compact(spark, dir, targetRecordsPerFile = 600)
    assert(parquetFiles(dir).size == 2) // ceil(1000/600)
    val after = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(after == before)
    // swap hygiene: no __tmp / __old residue
    assert(!new java.io.File(dir + "__tmp").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("compact to a single file when the table fits the target") {
    val dir = java.nio.file.Files.createTempDirectory("compact1").toString + "/t"
    (1 to 50).toDF("k").repartition(8).write.parquet(dir)
    Writers.compact(spark, dir) // default target far above 50 rows
    assert(parquetFiles(dir).size == 1)
    assert(spark.read.parquet(dir).as[Int].collect().toSet == (1 to 50).toSet)
  }

  test("compact recovers from a stale __old left by an interrupted prior run") {
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString + "/t"
    (1 to 100).toDF("k").repartition(4).write.parquet(dir)
    // simulate an interrupted prior compaction that left __old behind
    (999 to 999).toDF("k").write.parquet(dir + "__old")
    Writers.compact(spark, dir, targetRecordsPerFile = 1000)
    assert(spark.read.parquet(dir).as[Int].collect().toSet == (1 to 100).toSet)
    assert(!new java.io.File(dir + "__old").exists())
  }
}
