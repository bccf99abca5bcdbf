package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic splits
  * and context-window packing. Everything is hash- or key-derived — no
  * runtime RNG — so splits are reproducible run to run, engine to engine,
  * and a document's assignment never changes when the corpus grows (the
  * property `randomSplit` famously lacks).
  */
object Sampling {

  /** Deterministic train/val/test-style split by id hash: the first 8 md5
    * hex digits of the id, mod 100, compared against cumulative percentage
    * cut points. Stable under corpus growth and across engines (md5, not a
    * seeded hash). `cuts` maps split name -> percentage; entries are applied
    * in the given order and must sum to 100. */
  def hashSplit(id: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(100))
    val cumulative = cuts.scanLeft(0)(_ + _._2).tail
    cuts.map(_._1).zip(cumulative).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, upTo)) =>
        when(bucket < upTo, lit(name)).otherwise(acc)
      }
  }

  /** Contiguous per-shard context-window packing: documents are sharded by
    * id hash, and within each shard assigned to consecutive token-budget
    * bins by running token count. One partitioned window — no global sort,
    * no driver loop — which is what makes packing viable at corpus scale
    * (true first-fit-decreasing is inherently sequential; per-shard
    * contiguous fill is the standard distributed approximation, and shard
    * count = parallelism). Documents longer than the budget get a bin of
    * their own and overflow it (callers chunk upstream). */
  def contiguousBins(docs: DataFrame, idCol: String, textCol: String,
                     shards: Int, tokenBudget: Long): DataFrame = {
    require(shards >= 1 && tokenBudget >= 1)
    val shard = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(shards))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), shard.as("shard"),
        TF.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // a doc is labeled by the bin it STARTS in (tokens before it / budget):
      // bins start at 0 in every shard and zero-token docs can't go negative
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / tokenBudget).cast("long"))
      .select(idCol, "shard", "n_tokens", "bin")
  }
}
