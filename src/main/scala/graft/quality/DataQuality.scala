package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-style data-quality assertions (SURVEY §5): each check returns the
  * violating rows (empty = pass), mirroring dbt's "test query returns
  * failures" contract (severity handling is the caller's). All checks are
  * single-pass distributed plans — no collect.
  */
object DataQuality {

  final case class CheckResult(name: String, violations: Long, sample: DataFrame)

  private def result(name: String, bad: DataFrame): CheckResult =
    CheckResult(name, bad.count(), bad)

  /** dbt `unique`: key values appearing more than once. */
  def unique(df: DataFrame, cols: Seq[String]): CheckResult =
    result(s"unique(${cols.mkString(",")})",
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n")).filter(col("n") > 1))

  /** dbt `not_null`. */
  def notNull(df: DataFrame, c: String): CheckResult =
    result(s"not_null($c)", df.filter(col(c).isNull))

  /** dbt `relationships` (FK): child keys with no parent — anti join
    * (assert_foreign_key_crawl_state.sql shape). */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): CheckResult =
    result(s"relationships($childKey -> $parentKey)",
      child.join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti"))

  /** dbt_utils `accepted_range` (schema.yml:29-33 etc.). */
  def acceptedRange(df: DataFrame, c: String,
                    min: Option[Double] = None, max: Option[Double] = None): CheckResult = {
    require(min.isDefined || max.isDefined, s"accepted_range($c) needs min and/or max")
    val conds: Seq[Column] = min.map(col(c) < _).toSeq ++ max.map(col(c) > _).toSeq
    result(s"accepted_range($c)", df.filter(col(c).isNotNull && conds.reduce(_ || _)))
  }

  /** dbt `accepted_values`. */
  def acceptedValues(df: DataFrame, c: String, values: Seq[Any]): CheckResult =
    result(s"accepted_values($c)", df.filter(col(c).isNotNull && !col(c).isInCollection(values)))

  /** Run a suite; returns failures only (dbt severity=warn just logs them). */
  def run(checks: Seq[CheckResult]): Seq[CheckResult] = checks.filter(_.violations > 0)

  /** The reference's full test suite over a warehouse
    * (steam_analytics/models/staging/schema.yml + the five singular tests). */
  def steamSuite(w: graft.domain.SteamModels.Warehouse): Seq[CheckResult] = {
    import graft.domain.SteamModels._
    val g = stgGames(w)
    val p = stgPrices(w)
    val cs = stgCrawlState(w)
    Seq(
      unique(g, Seq("game_id")),
      notNull(g, "game_id"), notNull(g, "title"),
      acceptedRange(g, "required_age", Some(0), Some(18)),
      notNull(p, "game_id"), notNull(p, "price"),
      acceptedRange(p, "price", Some(0)),
      acceptedRange(p, "discount", Some(0), Some(100)),
      acceptedRange(p, "initial_price", Some(0)),
      relationships(p, "game_id", g, "game_id"),
      relationships(cs.withColumnRenamed("game_appid", "game_id"), "game_id", g, "game_id"),
      unique(cs, Seq("game_appid")))
  }

  /** Generic COLUMN PROFILER — the ANALYZE-style statistics sheet a
    * warehouse publishes per table (and the first thing a curation run
    * inspects on a new drop): one row per requested column with row count,
    * null count, exact distinct count, and min/max rendered as strings so
    * heterogeneous column types stack in one frame. One aggregate-only scan
    * PER COLUMN — each scan is column-pruned to exactly that column by the
    * parquet reader, so k narrow scans cost about one wide scan of I/O and
    * nothing shuffles (each agg is a 1-row global reduce with map-side
    * partials). min/max compare in the column's NATIVE type and stringify
    * only at the end — never lexicographic compares on numerics.
    * Stringification caveat: integers and strings render engine-identically;
    * floating-point columns may not ("1.0E7" vs "10000000.0") — profile
    * those via explicit rounds/casts on the caller side. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** Join-key SKEW report — the pre-flight check before picking a join
    * strategy (salt? AQE skew split? broadcast?): the k hottest key values
    * with their row share in integer MICRO-units (floor(1e6·cnt/total) —
    * one IEEE multiply-divide-floor, engine-exact). One partial-agg
    * groupBy(key) + a TakeOrdered of the (count desc, key asc) head —
    * never a global sort, and the full per-key table never leaves the
    * executors. A share_micro ≫ 1e6/shuffle-partitions on the top key is
    * the signature of a straggler task; q91's salted join is the cure. */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // The per-key table feeds BOTH the total and the top-k head; exchange
    // reuse does not fire across join subtrees (same reason bucketPairs
    // pins), so pin + materialize to scan the corpus exactly once. Bounded
    // by distinct keys, disk-spillable; same clearCache contract as
    // bucketPairs.
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count() // materialize so total and head both read the cache
    // share is exact integer division (cnt·10⁶ < 2⁶³ below ~9·10¹² rows)
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts
      .orderBy(col("cnt").desc, col(keyCol).asc).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("share_micro",
        expr("(cnt * 1000000) div __total"))
      .drop("__total")
  }
}
