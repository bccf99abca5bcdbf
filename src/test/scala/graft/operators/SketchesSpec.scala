package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("approx distinct within rsd of exact") {
    val exact = li.select("l_orderkey").distinct().count().toDouble
    val approx = Sketches.approxDistinct(li, Nil, "l_orderkey")
      .head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.1)
  }

  test("quantiles bracket the median") {
    val q = Sketches.quantiles(li, Seq("l_returnflag"), "l_quantity", Seq(0.25, 0.5, 0.75))
    val row = q.head().getSeq[Double](1)
    assert(row.size == 3 && row(0) <= row(1) && row(1) <= row(2))
  }

  test("frequent items finds the planted hot key") {
    val skewed = (1 to 1000).map(i => if (i % 3 == 0) 42 else i).toDF("k")
    val hot = Sketches.frequentItems(skewed, Seq("k"), 0.2)
      .head().getSeq[Int](0)
    assert(hot.contains(42))
  }
}
