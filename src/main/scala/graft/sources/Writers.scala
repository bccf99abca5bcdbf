package graft.sources

import org.apache.spark.sql.DataFrame

/** Batch file sinks (SURVEY §2.1 S9-S10). Buffering/batching from the
  * reference is Spark-internal; the semantic knobs that survive are part-file
  * record caps and append mode.
  */
object Writers {

  /** S9: append CSV with header. */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode("append").option("header", "true").csv(path)

  /** S10: size-capped JSON part files (reference rolls every 50 000 records,
    * utils/steam_reviews_crawler_validated_proxies.py:286-382). */
  def jsonParts(df: DataFrame, path: String, maxRecordsPerFile: Int = 50000): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .json(path)

  /** Warehouse-table write: parquet, optionally partitioned — at 100 TB the
    * prices/events tables partition by date so incremental jobs prune. */
  def table(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
            mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed catalog table: co-locates and pre-sorts by the join/agg key so
    * repeated joins between tables bucketed the same way skip the shuffle
    * entirely (the 100 TB answer to "this join runs every day"). */
  def bucketedTable(df: DataFrame, tableName: String, key: String,
                    numBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
}
