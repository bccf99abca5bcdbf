package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks re-expressing the reference's row-at-a-time /
  * SQL patterns as distributed, shuffle-aware Spark plans. Each method notes
  * its SURVEY §2 id and the scale story.
  */
object Relational {

  /** A1 GROUP_CONCAT(DISTINCT ... ) with deterministic sorted order and
    * SQL NULL-on-empty-group semantics (MySQL returns NULL when the group has
    * no non-null values; Spark's concat_ws would return "").
    * Partial aggregation (ObjectHashAggregate on collect_set) keeps the
    * shuffle to distinct values per group, not raw rows. */
  def groupConcatDistinct(values: Column, sep: String = ","): Column = {
    val set = array_sort(collect_set(values))
    when(size(set) === 0, lit(null).cast("string")).otherwise(array_join(set, sep))
  }

  /** W2 dedup keep-last per key: the reference relied on pandas file order
    * (drop_duplicates keep='last', utils/your_module.py:129); Spark has no
    * implicit row order, so the caller provides an explicit `order` column
    * (ingest offset / event time). One shuffle on `keys`. */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Dedup keep-FIRST per key by explicit arrival order (MySQL INSERT IGNORE
    * first-row-wins semantics). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W3 top-N rows per key (review cap). Window row_number: single shuffle on
    * key; AQE handles skewed keys. `order` must be a total order (include a
    * unique tiebreaker) for deterministic output. */
  def topNPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int,
                 rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** W4/J9 change detection: annotate each row with the previous row's values
    * (per key, by event order) and keep rows where any watched column changed.
    * Batch replay of the CDC before/after diff (tasks/steam_tasks_improved.py:595-599). */
  def changedRows(df: DataFrame, key: Column, order: Seq[Column], watched: Seq[Column],
                  prevPrefix: String = "prev_"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val withPrev = watched.foldLeft(df) { (d, c) =>
      d.withColumn(prevPrefix + c.toString, lag(c, 1).over(w))
    }
    // a dedicated first-row marker: keying "no previous row" off a watched
    // column's prev value conflates it with "previous value was null" and
    // silently drops changes in the other watched columns
    val changed = watched.map(c => !(col(prevPrefix + c.toString) <=> c)).reduce(_ || _)
    withPrev
      .withColumn("__has_prev", lag(lit(1), 1).over(w))
      .filter(col("__has_prev").isNotNull && changed)
      .drop("__has_prev")
  }

  /** J7/U3 incremental anti-join: rows of `all` whose `key` is not in
    * `processed`. Processed sets are small relative to the fact side at scale
    * -> broadcast the distinct key set. */
  def notYetProcessed(all: DataFrame, processed: DataFrame, key: String): DataFrame =
    all.join(broadcast(processed.select(key).distinct()), Seq(key), "left_anti")

  /** J6 existence gate (semi join against an entity table). */
  def existingOnly(df: DataFrame, entity: DataFrame, key: String): DataFrame =
    df.join(entity.select(key).distinct(), Seq(key), "left_semi")

  /** A5/ST1 crawl_state max-merge: per-key high-water-mark
    * (GREATEST(last_ts, new_ts) upsert semantics as one partial-aggregated
    * groupBy; merging into an existing state table is a full-outer + greatest). */
  def maxMerge(updates: DataFrame, key: String, tsCol: String): DataFrame =
    updates.groupBy(key).agg(max(tsCol).as(tsCol))

  /** S11 upsert (INSERT .. ON DUPLICATE KEY UPDATE): last-writer-wins merge of
    * `incoming` into `existing` by `keys`; `order` breaks ties within the
    * incoming batch. Equivalent to MERGE on an immutable store:
    * dedupe incoming, then existing anti-join incoming, union. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             order: Seq[Column]): DataFrame = {
    val deduped = dedupKeepLast(incoming, keys, order)
    existing.join(deduped.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(deduped)
  }

  /** S12 insert-ignore: append only rows whose key is absent. */
  def insertIgnore(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.dropDuplicates(keys).join(existing.select(keys.map(col): _*), keys, "left_anti"))

  /** As-of join (J9 generalized): for each left row, the latest right row of
    * the same key with rightTs <= leftTs. Implemented as union + window
    * last-ignoring-nulls — ONE shuffle on the key, no join at all, which at
    * 100 TB beats the naive join+filter+rank (that materializes every
    * (left, earlier-right) combination). The right payload travels as one
    * struct so all its columns come from the same matched row.
    * Right (key, ts) pairs should be unique — like ASOF JOIN, ties would be
    * resolved arbitrarily. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String], outPrefix: String = "asof_"): DataFrame = {
    val payloadStruct = struct(rightPayload.map(col): _*)
    val r = right.select(col(key), col(rightTs).as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__payload"))
    val leftCols = left.columns.toSeq
    val l = left.select(
      (Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(_ == key).map(col)): _*)
    // right rows with missing left columns: align schemas via unionByName
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.unionByName(rAligned)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side")) // right sorts first at equal ts -> inclusive <=
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = leftCols.map(c =>
      if (c == leftTs) col("__ts").as(leftTs) else col(c)) ++
      rightPayload.map(p => col(s"__match.$p").as(s"$outPrefix$p"))
    matched.select(out: _*)
  }

  /** Range join (left.value ∈ [right.lo, right.hi)), bucketized: Spark plans
    * a naive theta join as BroadcastNestedLoop/cartesian — O(|L|·|R|) compares
    * and a broadcast-size cliff. Instead, left rows key on
    * floor(value/bucketWidth) and each right range EXPLODES to the buckets it
    * spans, turning the theta join into an equi-join on the bucket id + a
    * residual predicate — shuffle-partitionable, AQE-skew-splittable, exact.
    * Each left row lives in exactly one bucket, so no pair dedup is needed.
    * Pick bucketWidth near the typical range width: spanned-buckets-per-range
    * (the explode factor) stays O(1) while bucket population stays balanced. */
  def rangeJoin(left: DataFrame, leftVal: String,
                right: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val lb = left.withColumn("__b", floor(col(leftVal) / bucketWidth).cast("long"))
    val rb = right
      .withColumn("__b", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__b"))
      .filter(col(leftVal) >= col(loCol) && col(leftVal) < col(hiCol))
      .drop("__b")
  }

  /** Skew-safe two-phase aggregation: salt the hot key space, partial-agg on
    * (key, salt), then final-agg on key. Identical result to a direct
    * groupBy-sum for exact types (long/decimal — order-independent); for
    * doubles the grouping order varies run to run, so route them through a
    * decimal cast first. The first shuffle spreads a hot key over
    * `saltBuckets` reducers (the aggregation-side analogue of AQE skew-join
    * splitting). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(key), col("__salt")).agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** J10 lookup-or-create surrogate keys: assign dense ids to names missing
    * from `dim`, continuing after max(existing id). Deterministic (name
    * order), unlike monotonically_increasing_id. The existing dim is
    * broadcast. New ids take the dim id column's OWN type (an int dim stays
    * int, a long dim stays long) with an explicit overflow guard — no silent
    * wraparound near Int.MaxValue. Numbering uses a distributed sort +
    * zipWithIndex instead of a single-partition global window; new keys per
    * batch are dim churn, inherently small, but the assignment is distributed
    * regardless. */
  def lookupOrCreate(dim: DataFrame, idCol: String, nameCol: String,
                     names: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val idType = dim.schema(idCol).dataType
    val spark = dim.sparkSession
    val maxId = dim.agg(coalesce(max(col(idCol).cast("long")), lit(0L))).head().getLong(0)
    val newNames = names.select(col(nameCol)).distinct()
      .join(broadcast(dim.select(nameCol)), Seq(nameCol), "left_anti")
      .sort(col(nameCol))
    if (idType == IntegerType) {
      val newCount = newNames.count()
      require(maxId + newCount <= Int.MaxValue.toLong,
        s"surrogate ids for IntegerType '$idCol' would overflow Int.MaxValue " +
          s"(max existing $maxId + $newCount new) — widen the dim id column to BIGINT")
    }
    val indexed = newNames.rdd.zipWithIndex()
      .map { case (r, i) => Row(r.get(0), maxId + i + 1) }
    val created = spark.createDataFrame(indexed,
      StructType(Seq(newNames.schema(nameCol),
        StructField("__newid", LongType, nullable = false))))
      .select(col("__newid").cast(idType).as(idCol), col(nameCol))
    dim.select(col(idCol), col(nameCol)).unionByName(created)
  }

  /** Skew-mitigated equi-join (salting). A shuffle join hash-partitions on the
    * key, so one hot key (a viral doc id, a default/sentinel value) lands its
    * entire row population on ONE reducer — the canonical straggler at 100 TB.
    * AQE's skew-join split only fires for sort-merge joins over recorded skew;
    * salting is the explicit, always-on form: the large side scatters each key
    * over `salts` sub-keys by hashing `scatterBy` (any per-row expression —
    * a unique id gives the evenest spread), the small side REPLICATES each row
    * to all `salts` sub-keys, and the join runs on (key, salt). Results are
    * exactly the plain join's: every (large, small) key match still meets on
    * precisely one salt. Cost: |small| × salts replication — keep `small`
    * dimension-sized; the large side is never replicated.
    *
    * Inner and left-outer semantics are supported (the salted small side
    * matches iff the unsalted one would, so left rows survive identically). */
  def saltedJoin(large: DataFrame, small: DataFrame, largeKey: String,
                 smallKey: String, scatterBy: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltedLarge = large.withColumn("__salt", pmod(xxhash64(scatterBy), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    saltedLarge
      .join(saltedSmall,
        saltedLarge(largeKey) === saltedSmall(smallKey) &&
          saltedLarge("__salt") === saltedSmall("__salt"), joinType)
      .drop(saltedSmall("__salt")).drop(saltedLarge("__salt"))
      .drop(saltedSmall(smallKey))
  }

  /** Snapshot diff — the dataset-versioning audit between two corpus
    * versions: every id classified `added` (new only), `removed` (old only),
    * `changed` (both, payload differs), or `unchanged`. Payload identity is
    * md5 over the \\u0001-joined `payloadCols` (null encoded as \\u0002, so
    * null vs '' vs absent are distinct), computed BEFORE the join so the
    * full-outer exchange carries (id, 32-byte hash) — never the payloads
    * themselves, which is what keeps the diff of two 100 TB snapshots a
    * cheap keyed join of narrow rows. One shuffle per side on the id; at
    * scale both snapshots bucketed on the id co-locate and the exchange
    * vanishes. Output: (id, status). */
  def snapshotDiff(old: DataFrame, neu: DataFrame, idCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws("\u0001",
          payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)).as(h))
    hashed(old, "__ho").join(hashed(neu, "__hn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
