package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("groupConcatDistinct sorts, dedupes, NULL on empty group (A1)") {
    val df = Seq((1, "b"), (1, "a"), (1, "b"), (2, null.asInstanceOf[String]))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(Relational.groupConcatDistinct(col("v")).as("c"))
      .orderBy("k").collect()
    assert(out(0).getString(1) == "a,b")
    assert(out(1).get(1) == null) // MySQL GROUP_CONCAT over no values -> NULL
  }

  test("dedupKeepLast keeps the highest-order row per key (W2)") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "ord", "v")
    val out = Relational.dedupKeepLast(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect().map(_.getString(2)).toSeq
    assert(out == Seq("new", "only"))
  }

  test("topNPerKey caps per key with rank column (W3)") {
    val df = (1 to 10).map(i => (i % 2, i)).toDF("k", "v")
    val out = Relational.topNPerKey(df, Seq("k"), Seq(col("v").desc), 3)
    assert(out.count() == 6)
    assert(out.filter(col("k") === 0).select("v").as[Int].collect().toSet == Set(10, 8, 6))
  }

  test("changedRows emits only rows whose watched value changed (W4/J9)") {
    val df = Seq((1, 1, 100.0), (1, 2, 100.0), (1, 3, 150.0), (2, 4, 5.0))
      .toDF("key", "seq", "value")
    val out = Relational.changedRows(df, col("key"), Seq(col("seq")), Seq(col("value")))
    assert(out.select("seq").as[Int].collect().toSeq == Seq(3))
  }

  test("upsert is last-writer-wins by key (S11)") {
    val existing = Seq((1, "old1"), (2, "old2")).toDF("k", "v")
    val incoming = Seq((2, "mid", 1), (2, "new2", 2), (3, "new3", 1)).toDF("k", "v", "ord")
    val out = Relational.upsert(existing.withColumn("ord", lit(0)), incoming,
      Seq("k"), Seq(col("ord")))
      .select("k", "v").orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("insertIgnore appends only absent keys (S12)") {
    val existing = Seq((1, "a")).toDF("k", "v")
    val incoming = Seq((1, "DUP"), (2, "b"), (2, "b2")).toDF("k", "v")
    val out = Relational.insertIgnore(existing, incoming, Seq("k"))
    assert(out.count() == 2)
    assert(out.filter(col("k") === 1).head().getString(1) == "a")
  }

  test("lookupOrCreate assigns dense ids after max existing (J10)") {
    val dim = Seq((1, "alpha"), (2, "beta")).toDF("id", "name")
    val names = Seq("beta", "delta", "carol", "delta").toDF("name")
    val out = Relational.lookupOrCreate(dim, "id", "name", names)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "alpha"), (2, "beta"), (3, "carol"), (4, "delta")))
  }

  test("lookupOrCreate derives the id type from the dim and guards int overflow") {
    val dimL = Seq((10L, "alpha")).toDF("id", "name")
    val out = Relational.lookupOrCreate(dimL, "id", "name",
      Seq("alpha", "beta", "carol").toDF("name"))
    assert(out.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(out.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((10L, "alpha"), (11L, "beta"), (12L, "carol")))
    // an int dim near Int.MaxValue must refuse to wrap silently
    val dimI = Seq((Int.MaxValue - 1, "alpha")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Relational.lookupOrCreate(dimI, "id", "name",
        Seq("beta", "carol", "delta").toDF("name"))
    }
  }

  test("rangeJoin: bucketized equi-join matches the theta-join semantics exactly") {
    val left = Seq((1, 5.0), (2, 10.0), (3, 25.0), (4, -3.0), (5, 10.0)).toDF("id", "v")
    val ranges = Seq((100, 0.0, 10.0), (200, 5.0, 30.0), (300, -10.0, 0.0))
      .toDF("rid", "lo", "hi")
    for (width <- Seq(1.0, 7.0, 100.0)) { // result must be width-independent
      val got = Relational.rangeJoin(left, "v", ranges, "lo", "hi", width)
        .select("id", "rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      // hand-checked theta join: v >= lo && v < hi (10.0 excluded from [0,10))
      assert(got == Set((1, 100), (1, 200), (2, 200), (3, 200), (5, 200), (4, 300)),
        s"width $width")
    }
    // the plan is an equi-join, not a nested-loop/cartesian pair scan
    val plan = Relational.rangeJoin(left, "v", ranges, "lo", "hi", 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan.take(400))
  }

  test("notYetProcessed / existingOnly anti and semi joins (J6/J7)") {
    val all = Seq(1, 2, 3, 4).toDF("id")
    val processed = Seq(2, 4).toDF("id")
    assert(Relational.notYetProcessed(all, processed, "id")
      .as[Int].collect().toSet == Set(1, 3))
    assert(Relational.existingOnly(all, processed, "id")
      .as[Int].collect().toSet == Set(2, 4))
  }
}
