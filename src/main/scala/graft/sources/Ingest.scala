package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The ingest seam (SURVEY §2.1 S4-S8): the engine proper starts at files and
  * message streams; HTTP/HTML crawling lives behind these interfaces so the
  * core is testable offline (driver env is zero-egress) and the distributed
  * shape — per-partition fan-out with bounded concurrency, retry, and
  * per-key cursors — is engine code, not crawler code.
  */
object Ingest {

  /** One fetch attempt. Implementations wrap an HTTP client; tests inject
    * deterministic fakes. Must be thread-safe per partition. */
  trait Fetcher[K, V] extends Serializable {
    def fetch(key: K): Either[String, V] // Left = error message
  }

  final case class FetchResult[K, V](key: K, value: Option[V], error: Option[String],
                                     attempts: Int)

  /** S5-style per-key detail fetch, distributed: each partition walks its keys
    * with retry + exponential backoff (APIConfig: 3 retries, 2^n backoff —
    * config/settings.py:39-41). The reference's 20-thread pool becomes
    * partition parallelism; `repartition(n)` upstream sets the fan-out. */
  def fetchPerKey[K, V](keys: Dataset[K], fetcher: Fetcher[K, V],
                        maxRetries: Int = 3, backoffMs: Long = 0)(
                         implicit ev: org.apache.spark.sql.Encoder[FetchResult[K, V]])
  : Dataset[FetchResult[K, V]] =
    keys.mapPartitions { it =>
      it.map { k =>
        var attempt = 0
        var out: FetchResult[K, V] = null
        while (out == null) {
          attempt += 1
          fetcher.fetch(k) match {
            case Right(v) => out = FetchResult(k, Some(v), None, attempt)
            case Left(err) if attempt > maxRetries => out = FetchResult(k, None, Some(err), attempt)
            case Left(_) =>
              if (backoffMs > 0) Thread.sleep(backoffMs << (attempt - 1))
          }
        }
        out
      }
    }

  /** S6-style cursor pagination per key: pull pages until the cursor repeats,
    * the page is empty, or the per-key cap is reached (the reference caps at
    * 10 reviews/app — utils/steam_reviews_crawler_validated_proxies.py:33). */
  trait PagedFetcher[K, V] extends Serializable {
    /** @return (items, nextCursor) */
    def page(key: K, cursor: String): (Seq[V], String)
  }

  def fetchPaged[K, V](keys: Dataset[K], fetcher: PagedFetcher[K, V],
                       perKeyCap: Int, startCursor: String = "*")(
                        implicit ev: org.apache.spark.sql.Encoder[(K, V)]): Dataset[(K, V)] =
    keys.mapPartitions { it =>
      it.flatMap { k =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[(K, V)]
        var cursor = startCursor
        var prev: String = null
        var done = false
        while (!done && acc.size < perKeyCap) {
          val (items, next) = fetcher.page(k, cursor)
          acc ++= items.take(perKeyCap - acc.size).map(v => (k, v))
          done = items.isEmpty || next == cursor || next == prev || next == null
          prev = cursor
          cursor = next
        }
        acc
      }
    }

  /** Explicit ingest-order column for keep-last semantics (W2): Spark has no
    * implicit row order, so arrival order must be carried as data. For file
    * batches: (file name, position within file) is a stable total order. */
  def withIngestOrder(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    df.withColumn("_ingest_file", input_file_name())
      .withColumn("_ingest_pos", row_number().over(w))
  }
}
