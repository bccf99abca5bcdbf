package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "fake-jpeg-bytes-1".getBytes("UTF-8"),
        Row("image/jpeg", 640, 480, null, null)),
      Row(2L, "image", "fake-jpeg-bytes-2".getBytes("UTF-8"),
        Row("image/jpeg", 800, 600, null, null)),
      Row(3L, "image", Array.empty[Byte], Row("image/jpeg", 0, 0, null, null)), // dropped
      Row(4L, "video", ("frame0" * 10 + "frame1" * 10 + "frame2" * 10).getBytes("UTF-8"),
        Row("video/mp4", 1920, 1080, null, 5000L)),
      Row(5L, "audio", ("pcm" * 100).getBytes("UTF-8"),
        Row("audio/wav", null, null, 16000, 2000L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decodeImages: batched decode seam, schema contract, empty rows dropped") {
    val out = Multimodal.decodeImages(media)
    assert(out.columns.toSeq == Seq("media_id", "width", "height", "channels", "embedding"))
    val got = out.collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L)) // empty-content row 3 dropped
  }

  test("decodeImages is deterministic across runs (retry safety)") {
    val a = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq.map(_.toString)
    val b = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq.map(_.toString)
    assert(a == b)
  }

  test("decode runs narrow: partition count preserved, no shuffle") {
    val out = Multimodal.decodeImages(media)
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sampleFrames: every-nth chunking of the video payload") {
    val frames = Multimodal.sampleFrames(media, chunkBytes = 60, everyNth = 2)
    val idx = frames.select("chunk_idx").as[Int].collect().toSeq.sorted
    assert(idx == Seq(0, 2)) // 180 bytes / 60 = 3 chunks, keep 0 and 2
    val f0 = new String(frames.filter(col("chunk_idx") === 0).head().getAs[Array[Byte]]("frame"), "UTF-8")
    assert(f0 == "frame0" * 10)
  }

  test("audioWindows: windowed rows with deterministic energy in [0,1]") {
    val w = Multimodal.audioWindows(media, windowBytes = 100)
    val rows = w.collect()
    assert(rows.length == 3) // 300 bytes / 100
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }
}
