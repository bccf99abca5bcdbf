package graft.operators

import graft.SparkSpec
import graft.quality.DataQuality
import org.apache.spark.sql.functions._

/** Round-4 profiling/quality operators: char entropy, n-gram diversity,
  * column profiler, per-group heavy hitters. */
class ProfilingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy: uniform 2-char distribution is exactly 1 bit") {
    val d = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "abcd")).toDF("doc_id", "text")
    val r = TextStats.charEntropy(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1) == (2L, 1.0))     // p=.5/.5 -> 1 bit
    assert(r(2) == (1L, -0.0) || r(2) == (1L, 0.0)) // single char -> 0 bits
    assert(r(3) == (4L, 2.0))     // uniform over 4 chars -> 2 bits
  }

  test("charEntropy: empty/null text yields no row; repetition scores below prose") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "xyxyxyxyxyxyxyxy"), (4L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val r = TextStats.charEntropy(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(!r.contains(1L) && !r.contains(2L))
    assert(r(3L) < r(4L)) // boilerplate repetition < natural prose
  }

  test("ngramDiversity: fully repeated bigrams vs all-unique") {
    val d = Seq(
      ("tpl", "a a a a"),             // bigrams: "a a" x3 -> 1/3
      ("uni", "w x y z"),             // 3 distinct bigrams of 3 -> 1.0
      ("tpl", "a a a a")              // same template again -> 1/6
    ).toDF("source", "text")
    val r = TextStats.ngramDiversity(d, "source", "text", n = 2)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("uni") == (3L, 3L, 1.0))
    assert(r("tpl") == (6L, 1L, 0.166667))
  }

  test("columnProfile: nulls, exact distincts, native-typed min/max") {
    val d = Seq((3L, Option("b")), (1L, None), (2L, Option("a")), (10L, Option("a")))
      .toDF("k", "v")
    val r = DataQuality.columnProfile(d, Seq("k", "v"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4), x.getString(5))).toMap
    // min/max of k compare NUMERICALLY: 10 is max, not lexicographic "3"
    assert(r("k") == (4L, 0L, 4L, "1", "10"))
    assert(r("v") == (4L, 1L, 2L, "a", "b")) // distinct excludes NULL
  }

  test("topTokensPerGroup: exact counts with total-order tie-break") {
    val d = Seq(
      ("s1", "b b a a c"), ("s1", "a"),
      ("s2", "z z z")).toDF("source", "text")
    val r = TextStats.topTokensPerGroup(d, "source", "text", k = 2)
      .orderBy("source", "rnk")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getInt(3)))
    // s1: a=3 beats b=2; s2 has only z
    assert(r.toSeq == Seq(("s1", "a", 3L, 1), ("s1", "b", 2L, 2), ("s2", "z", 3L, 1)))
  }

  test("topTokensPerGroup: equal counts break ties by token asc, deterministically") {
    val d = Seq(("s", "b a")).toDF("source", "text")
    val r = TextStats.topTokensPerGroup(d, "source", "text", k = 2)
      .orderBy("rnk").collect().map(x => (x.getString(1), x.getInt(3)))
    assert(r.toSeq == Seq(("a", 1), ("b", 2)))
  }
}
