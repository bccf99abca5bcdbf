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

  test("readOrEmptyReadOnly resolves an interrupted swap WITHOUT renaming") {
    // a reader racing a locked writer's promoteSwap must see the post-
    // recovery content but leave the dirs exactly where the writer's
    // checked renames expect them (r7 advice: a reader-side recovery
    // rename spuriously failed the writer's require)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))
    val dir = java.nio.file.Files.createTempDirectory("roswap").toString + "/t"
    // crash window 1: dst missing, displaced state at __old
    (1 to 5).toDF("k").write.parquet(dir + "__old")
    assert(Writers.readOrEmptyReadOnly(spark, dir, schema)
      .as[Int].collect().toSet == (1 to 5).toSet)
    assert(new java.io.File(dir + "__old").exists() &&
      !new java.io.File(dir).exists(), "reader mutated the swap state")
    // crash window 2: a COMPLETED __tmp (its _SUCCESS proves it) wins over
    // __old — identical priority to recoverSwap's
    (6 to 9).toDF("k").write.parquet(dir + "__tmp")
    assert(Writers.readOrEmptyReadOnly(spark, dir, schema)
      .as[Int].collect().toSet == (6 to 9).toSet)
    assert(new java.io.File(dir + "__tmp").exists() &&
      new java.io.File(dir + "__old").exists() &&
      !new java.io.File(dir).exists(), "reader mutated the swap state")
    // steady state: destination present reads the destination
    (10 to 12).toDF("k").write.parquet(dir)
    assert(Writers.readOrEmptyReadOnly(spark, dir, schema)
      .as[Int].collect().toSet == (10 to 12).toSet)
    // absent everywhere: empty frame, not an error
    val none = java.nio.file.Files.createTempDirectory("roswap2").toString + "/x"
    assert(Writers.readOrEmptyReadOnly(spark, none, schema).count() == 0)
  }

  test("stateExistsReadOnly sees committed state through every swap window") {
    // the overlay fast-path probe (r12 advice): a destination-only
    // existence check would transiently report committed state absent
    // while a concurrent swapReplace holds it at __old (or a completed
    // __tmp) — an unpinned reader would skip committed edits for that
    // instant. The probe's priority matches readOrEmptyReadOnly's.
    val dir = java.nio.file.Files.createTempDirectory("seprobe").toString + "/t"
    assert(!Writers.stateExistsReadOnly(spark, dir), "absent everywhere")
    // mid-swap window: displaced state at __old only
    (1 to 3).toDF("k").write.parquet(dir + "__old")
    assert(Writers.stateExistsReadOnly(spark, dir), "__old is committed state")
    // a COMPLETED __tmp also counts (its _SUCCESS proves the write)
    (4 to 6).toDF("k").write.parquet(dir + "__tmp")
    assert(Writers.stateExistsReadOnly(spark, dir))
    // an INCOMPLETE __tmp alone does not
    val dir2 = java.nio.file.Files.createTempDirectory("seprobe2").toString + "/t"
    new java.io.File(dir2 + "__tmp").mkdirs()
    assert(!Writers.stateExistsReadOnly(spark, dir2),
      "a torn __tmp without _SUCCESS is not committed state")
    // steady state
    (7 to 9).toDF("k").write.parquet(dir2)
    assert(Writers.stateExistsReadOnly(spark, dir2))
  }

  test("pointer protocol: flip is atomic-enough for readers; recovery completes or discards") {
    val dir = java.nio.file.Files.createTempDirectory("ptr").toString
    val ptr = s"$dir/GEN"
    // no pointer at all -> None (the legacy-store signal)
    assert(Writers.readPointerReadOnly(spark, ptr).isEmpty)
    Writers.writePointer(spark, ptr, "0")
    assert(Writers.readPointerReadOnly(spark, ptr).contains("0"))
    Writers.writePointer(spark, ptr, "1")
    assert(Writers.readPointerReadOnly(spark, ptr).contains("1"))
    val fs = new org.apache.hadoop.fs.Path(ptr)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def plant(path: String, v: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
      out.write(v.getBytes("UTF-8")); out.close()
    }
    // crash between the delete and the rename: only __tmp survives — a
    // reader resolves the NEW value; writer-side recovery promotes it
    fs.delete(new org.apache.hadoop.fs.Path(ptr), false)
    plant(s"${ptr}__tmp", "2")
    assert(Writers.readPointerReadOnly(spark, ptr).contains("2"))
    Writers.recoverPointer(spark, ptr)
    assert(Writers.readPointerReadOnly(spark, ptr).contains("2"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${ptr}__tmp")))
    // crash BEFORE the delete: destination wins, the stale attempt drops
    plant(s"${ptr}__tmp", "9")
    assert(Writers.readPointerReadOnly(spark, ptr).contains("2"),
      "destination must shadow a not-yet-committed __tmp")
    Writers.recoverPointer(spark, ptr)
    assert(Writers.readPointerReadOnly(spark, ptr).contains("2"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${ptr}__tmp")))
    // an empty/torn pointer file throws LOUDLY rather than reading as
    // absent: absent means "legacy store, use the root layout", and a
    // versioned store degraded there serves an empty frame — a transient-
    // IO-to-wrong-answer path (round-9 advice)
    fs.delete(new org.apache.hadoop.fs.Path(ptr), false)
    plant(ptr, "")
    val ex = intercept[IllegalStateException] {
      Writers.readPointerReadOnly(spark, ptr)
    }
    assert(ex.getMessage.contains("could not be read"))
  }
}
