package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits exactly (q98)") {
    // a=0b0011=3, b=0b0101=5 -> z bits: a0,b0,a1,b1,a2,b2,a3,b3
    //   = 1,1,1,0,0,1,0,0 (lsb first) = 0b00100111 = 39
    val df = Seq((3, 5)).toDF("a", "b")
    val z = df.select(Layout.zValue2(col("a"), col("b"), 4)).head().getLong(0)
    assert(z == 39L)
  }

  test("zValue2 matches a reference implementation on a value sweep") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val pairs = for (a <- 0 until 40; b <- 0 until 40) yield (a, b)
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b"), 8).as("z"))
      .collect()
    out.foreach(r => assert(r.getLong(2) == ref(r.getInt(0), r.getInt(1), 8)))
  }

  test("zValue2 is injective within the bit budget") {
    val pairs = for (a <- 0 until 64; b <- 0 until 64) yield (a, b)
    val n = pairs.toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b"), 6).as("z"))
      .distinct().count()
    assert(n == 64L * 64L)
  }

  test("zValue2 clusters both dimensions (file-skipping beats single-column sort)") {
    // the metric that matters for zone maps: a contiguous CHUNK of the sort
    // order (≈ one file) should have a tight bounding box in BOTH dims. Lex
    // order gives 2x32 slabs (a filter on b prunes nothing); z-order gives
    // 8x8 quadrants — the max bbox side is what min/max stats prune on.
    val pts = for (a <- 0 until 32; b <- 0 until 32) yield (a, b)
    val byZ = pts.sortBy { case (a, b) =>
      (0 until 5).foldLeft(0L)((acc, i) =>
        acc | (((a.toLong >> i) & 1) << (2 * i)) | (((b.toLong >> i) & 1) << (2 * i + 1)))
    }
    val byLex = pts.sorted
    def meanMaxSide(s: Seq[(Int, Int)]) =
      s.grouped(64).map { chunk =>
        val as = chunk.map(_._1); val bs = chunk.map(_._2)
        math.max(as.max - as.min, bs.max - bs.min)
      }.sum.toDouble / (s.size / 64)
    assert(meanMaxSide(byZ) * 2 < meanMaxSide(byLex),
      s"z chunks ${meanMaxSide(byZ)} not tighter than lex ${meanMaxSide(byLex)}")
  }

  test("zorderLayout plans one range exchange on z plus in-partition sort") {
    val df = (0 until 100).map(i => (i % 10, i / 10, s"p$i")).toDF("x", "y", "payload")
    val out = Layout.zorderLayout(df, col("x"), col("y"), bits = 4, numFiles = 4)
    // match on plan text: AQE wraps the tree, so node collect() sees nothing
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("Exchange rangepartitioning(z#"),
      s"expected a range exchange on z:\n$planStr")
    assert(!planStr.contains("Exchange hashpartitioning"),
      s"unexpected hash exchange:\n$planStr")
    // every partition is internally sorted by z
    val zs = out.select("z").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq)).collect()
    zs.foreach(p => assert(p == p.sorted))
    assert(zs.map(_.size).sum == 100)
  }

  test("zorderLayout range-partitions z contiguously (file-skipping premise)") {
    val df = (0 until 256).map(i => (i % 16, i / 16)).toDF("x", "y")
    val out = Layout.zorderLayout(df, col("x"), col("y"), bits = 4, numFiles = 4)
    val perPart = out.select("z").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    // partitions hold disjoint contiguous z-ranges: max of one < min of next
    val ranges = perPart.map(p => (p.min, p.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ =>
    }
  }
}
