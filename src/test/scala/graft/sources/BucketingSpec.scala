package graft.sources

import graft.SparkSpec
import graft.streaming.Streams
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without a shuffle (co-located join)") {
    val facts = (1 to 1000).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    val dims = (0 until 50).map(i => (i, s"name-$i")).toDF("k", "name")
    Writers.bucketedTable(facts, "b_facts", "k", 8)
    Writers.bucketedTable(dims, "b_dims", "k", 8)
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      // force a sort-merge path so the bucket co-location is what's tested
      val smj = joined.hint("merge")
      val plan = smj.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(smj.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("session windows: gap-based event-time sessions (extension)") {
    val events = Seq(
      (1, "2024-01-01 00:00:00", 1.0),
      (1, "2024-01-01 00:03:00", 2.0),  // same session (gap < 5 min)
      (1, "2024-01-01 01:00:00", 3.0),  // new session
      (2, "2024-01-01 00:00:00", 4.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val sessions = events
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val out = sessions.select("user_id", "n", "total")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1, 2L, 3.0), (1, 1L, 3.0), (2, 1L, 4.0)))
  }

  test("windowedCounts streaming vs batch date_trunc agree on totals") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")).agg(sum("n")).head().getLong(0)
    assert(batch == ev.count())
  }
}
