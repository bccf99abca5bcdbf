package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeterministicSketchesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1, "a a b c"), (2, "a b d"), (3, "e f g a")).toDF("id", "text")

  test("count-min never underestimates (the CMS guarantee, q99)") {
    val rep = DeterministicSketches.countMinReport(docs, "text", depth = 4, width = 8)
      .collect()
    assert(rep.nonEmpty)
    rep.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"token ${r.getString(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}"))
    // truth check on a known token: 'a' appears 4 times
    val a = rep.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 4L)
  }

  test("count-min is exact when the grid is wide enough (no collisions)") {
    val rep = DeterministicSketches.countMinReport(docs, "text", depth = 4, width = 4096)
      .collect()
    rep.foreach(r => assert(r.getLong(2) == r.getLong(1)))
  }

  test("count-min sketches merge cell-wise (distributed union)") {
    val half1 = docs.filter(col("id") <= 2)
    val half2 = docs.filter(col("id") > 2)
    val merged = DeterministicSketches.countMinSketch(half1, "text", 4, 8)
      .unionByName(DeterministicSketches.countMinSketch(half2, "text", 4, 8))
      .groupBy("i", "b").agg(sum("c").as("c"))
    val whole = DeterministicSketches.countMinSketch(docs, "text", 4, 8)
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet ==
      whole.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("hll registers merge by max (distributed union)") {
    val ids = (1 to 400).map(i => Tuple1(s"key$i")).toDF("k")
    val half1 = ids.filter(length(col("k")) <= 5) // key1..key99
    val half2 = ids.filter(length(col("k")) > 5)
    val whole = DeterministicSketches.hllRegisters(ids, "k", 64)
    val merged = DeterministicSketches.hllRegisters(half1, "k", 64)
      .unionByName(DeterministicSketches.hllRegisters(half2, "k", 64))
      .groupBy("reg").agg(max("m_j").as("m_j"))
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      whole.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("hll estimate lands within the m=64 error envelope (q100)") {
    val n = 5000
    val ids = (1 to n).map(i => Tuple1(s"id$i")).toDF("k")
    val row = DeterministicSketches.hllReport(ids, "k", 64).head()
    val exact = row.getLong(0)
    val est = row.getDouble(2)
    assert(exact == n)
    // standard error 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - n) < n * 0.39, s"estimate $est vs exact $n")
  }

  test("hll small-range correction engages for tiny cardinalities") {
    val ids = (1 to 10).map(i => Tuple1(s"x$i")).toDF("k")
    val row = DeterministicSketches.hllReport(ids, "k", 64).head()
    assert(row.getLong(1) > 0) // zero registers present
    assert(math.abs(row.getDouble(2) - 10.0) < 5.0) // linear counting is tight here
  }

  test("hll of an empty input estimates zero") {
    val ids = Seq.empty[Tuple1[String]].toDF("k")
    val row = DeterministicSketches.hllReport(ids, "k", 64).head()
    assert(row.getLong(0) == 0L && row.getDouble(2) == 0.0)
  }

  test("both sketches reject bad geometry") {
    intercept[IllegalArgumentException] {
      DeterministicSketches.countMinSketch(docs, "text", depth = 0, width = 8)
    }
    intercept[IllegalArgumentException] {
      DeterministicSketches.hllRegisters(docs.selectExpr("id as k"), "k", m = 63)
    }
  }
}
