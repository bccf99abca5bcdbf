package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofSaltSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches the latest prior-or-equal right row per key") {
    val quotes = Seq( // key, ts, px
      (1, 10L, 100.0), (1, 20L, 110.0), (1, 30L, 120.0),
      (2, 15L, 50.0)).toDF("k", "ts", "px")
    val trades = Seq(
      (1, 5L, "t-early"),   // before any quote -> null
      (1, 20L, "t-equal"),  // equal ts -> inclusive match 110
      (1, 25L, "t-mid"),    // -> 110
      (1, 99L, "t-late"),   // -> 120
      (2, 20L, "t-other"),  // -> 50
      (3, 20L, "t-nokey")   // no quotes for key -> null
    ).toDF("k", "ts", "tag")
    val out = Relational.asofJoin(trades, quotes, "k", "ts", "ts", Seq("px"))
      .orderBy("k", "ts")
      .select("tag", "asof_px").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(out == Seq(
      ("t-early", None), ("t-equal", Some(110.0)), ("t-mid", Some(110.0)),
      ("t-late", Some(120.0)), ("t-other", Some(50.0)), ("t-nokey", None)))
  }

  test("asofJoin plans a single shuffle, no join operator") {
    val quotes = Seq((1, 10L, 1.0)).toDF("k", "ts", "px")
    val trades = Seq((1, 20L, "t")).toDF("k", "ts", "tag")
    val plan = Relational.asofJoin(trades, quotes, "k", "ts", "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan) // union sides
  }

  test("saltedSum equals direct groupBy sum on exact types") {
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Relational.saltedSum(df, "k", "v", saltBuckets = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
