package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate analytics (SURVEY §2.4 notes these as out-of-parity-scope but
  * trivially exposable — they're the tools that keep exploratory queries at
  * 100 TB from shuffling exact distincts):
  *
  *  - HLL++ distinct counts (fixed-size sketch per group, mergeable)
  *  - t-digest-style quantiles via approx_percentile
  *  - count-min-style frequent items via freqItems
  *
  * All map-side-combinable: the shuffle carries sketches, not values. */
object Sketches {

  /** Distinct keys per group without an exact distinct shuffle. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Quantiles per group (t-digest under the hood). */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        typedLit(probs), lit(accuracy)).as(s"quantiles_$valueCol"))

  /** Frequent items across columns (support = min frequency fraction). */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols, support)
}
