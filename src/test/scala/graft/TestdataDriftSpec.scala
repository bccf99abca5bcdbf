package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Guards the engine's timestamp contract against driver-side testdata
  * regeneration (the round-3 regression: events.ts flipped from
  * TIMESTAMP(NANOS) to µs-NTZ and the epoch casts in q10/q50/q61 went from
  * green to DATATYPE_MISMATCH with zero compile-time signal). Every physical
  * encoding the generator has ever produced is written as a parquet fixture
  * here and pushed through Tables.events AND the actual epoch-dependent
  * registered queries, so the next encoding flip fails THIS spec by name
  * instead of three opaque driver rows. Tables.schemaDrift is pinned too. */
class TestdataDriftSpec extends SparkSpec {

  private def fixtureDir(suffix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-drift-$suffix").toString

  // 2024-01-01T00:00:10Z = epoch 1704067210; two users, one >30 min gap
  private def baseEvents = {
    import spark.implicits._
    Seq(
      (1L, "2024-01-01 00:00:10", 7L, "click", 1.5, "{}"),
      (2L, "2024-01-01 00:20:10", 7L, "view", 2.0, "{}"),
      (3L, "2024-01-01 02:00:00", 7L, "click", 0.5, "{}"),
      (4L, "2024-01-01 00:00:10", 8L, "buy", 9.0, "{}"))
      .toDF("event_id", "raw", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("raw")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def epochQueriesRun(dir: String): Unit = {
    val q10 = SparkEntry.queries("q10_project_cast")(spark, dir)
      .orderBy("event_id").collect()
    assert(q10.length == 4)
    assert(q10.head.getAs[Long]("epoch_s") == 1704067210L)
    assert(q10.head.getAs[String]("file_date") == "01012024")
    // user 7 splits into 2 sessions (115-min gap), user 8 has 1
    assert(SparkEntry.queries("q50_sessionize")(spark, dir).count() == 3)
    assert(SparkEntry.queries("q61_time_range_frame")(spark, dir).count() == 4)
  }

  test("drift guard: µs-NTZ events (current generator) normalize to TIMESTAMP") {
    val dir = fixtureDir("ntz")
    baseEvents.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // the fixture really is NTZ on disk as far as this session reads it
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    epochQueriesRun(dir)
  }

  test("drift guard: ns-as-long events (old generator) floor-truncate to µs") {
    val dir = fixtureDir("ns")
    // simulate nanosAsLong surfacing TIMESTAMP(NANOS) as int64 nanoseconds
    baseEvents.withColumn("ts",
        (col("ts").cast("double") * 1e9).cast(LongType) + lit(999L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    epochQueriesRun(dir) // the +999 ns must floor away, not round up
  }

  test("drift guard: µs-LTZ events pass through untouched") {
    val dir = fixtureDir("ltz")
    baseEvents.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    epochQueriesRun(dir)
  }

  test("drift guard: orders/lineitem date columns normalize from every encoding too") {
    import spark.implicits._
    // the o_orderdate/l_shipdate twins of the events.ts regression: write
    // each as ns-long and as NTZ; the loaders must yield TIMESTAMP and the
    // date-typed queries must still run
    val dir = fixtureDir("dates")
    def ordersDf = Seq((1L, 1L, "O", 10.0, "2024-03-05 00:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "od", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("od"))).drop("od")
    // ns-as-long orders
    ordersDf.withColumn("o_orderdate",
        (col("o_orderdate").cast("double") * 1e9).cast(LongType))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(Tables.orders(spark, dir).schema("o_orderdate").dataType == TimestampType)
    // NTZ lineitem
    Seq((1L, 1L, 1L, 1, 35.0, 100.0, 0.1, 0.0, "N", "O", "2024-03-05 00:00:00"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd")).cast(TimestampNTZType)).drop("sd")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val li = Tables.lineitem(spark, dir)
    assert(li.schema("l_shipdate").dataType == TimestampType)
    // the date-consuming query shapes still run over the fixtures
    assert(SparkEntry.queries("q22_date_roundtrip")(spark, dir).count() == 1)
    assert(SparkEntry.queries("q08_filter_range")(spark, dir).count() == 1)
  }

  test("schemaDrift: clean on a conforming dir, loud on a broken one") {
    import spark.implicits._
    val dir = fixtureDir("schema")
    // minimal conforming tables (schemaDrift only checks names + events.ts)
    Seq((0, "AFRICA")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$dir/region.parquet")
    Seq((0, "ALGERIA", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, "c", 0, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "s", 0, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "p", "b", "t", 1, 0.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "O", 0.0, "2024-01-01 00:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "od", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("od"))).drop("od")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01 00:00:00"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
      .write.parquet(s"$dir/lineitem.parquet")
    baseEvents.write.parquet(s"$dir/events.parquet")
    Seq((1L, "hello", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((1L, Seq(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    assert(Tables.schemaDrift(spark, dir).isEmpty)

    // break events: rename ts -> event_time; drift must name the table
    val broken = fixtureDir("schema-broken")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").write.parquet(s"$broken/$t.parquet")
    }
    baseEvents.withColumnRenamed("ts", "event_time")
      .write.parquet(s"$broken/events.parquet")
    val drift = Tables.schemaDrift(spark, broken)
    assert(drift.exists(_.contains("events")), drift.mkString("; "))
  }
}
