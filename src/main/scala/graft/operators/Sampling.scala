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
    * seeded hash). `cuts` maps split name -> positive percentage; entries
    * are applied in the given order and must sum to 100. A null id lands in
    * the LAST split (the CASE-fallthrough branch, matching SQL semantics). */
  def hashSplit(id: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    require(cuts.forall(_._2 > 0), "split percentages must be positive")
    val bucket = pmod(TF.md5Prefix32(id.cast("string")), lit(100))
    val cumulative = cuts.scanLeft(0)(_ + _._2).tail
    cuts.map(_._1).zip(cumulative).reverse
      .foldLeft(lit(cuts.last._1)) { case (acc, (name, upTo)) =>
        when(bucket < upTo, lit(name)).otherwise(acc)
      }
  }

  /** Stratified top-fraction sampling: within each stratum keep the best
    * `num/den` fraction of rows by `scoreCol` (ties broken by the unique
    * `tieCol`, so the cut is a total order). The keep test `rn·den <= n·num`
    * is pure integer arithmetic — no float rank boundary to diverge between
    * engines or runs. One shuffle on the stratum key; count and row_number
    * share the same window exchange. Deterministic under reruns AND under
    * per-stratum growth of the corpus (unlike sampleBy's RNG). */
  def stratifiedTopFrac(df: DataFrame, strataCol: String, scoreCol: Column,
                        tieCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= num, s"fraction num/den must be in (0,1], got $num/$den")
    val w = Window.partitionBy(col(strataCol)).orderBy(scoreCol.desc, col(tieCol))
    val wc = Window.partitionBy(col(strataCol))
    // row_number() is IntegerType: widen BEFORE multiplying, or a stratum
    // beyond Int.MaxValue/den rows wraps negative and silently passes the cut
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(col("__rn") * den <= col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Contiguous per-shard context-window packing: documents are sharded by
    * id hash, and within each shard assigned to consecutive token-budget
    * bins by running token count. One partitioned window — no global sort,
    * no driver loop — which is what makes packing viable at corpus scale
    * (true first-fit-decreasing is inherently sequential; per-shard
    * contiguous fill is the standard distributed approximation, and shard
    * count = parallelism). A document is labeled by the bin its FIRST token
    * falls in; an over-budget document overflows that bin, and the next
    * boundary realigns at the following budget multiple (so subsequent bins
    * stay budget-aligned) — callers chunk oversized docs upstream if strict
    * per-bin caps are required. */
  def contiguousBins(docs: DataFrame, idCol: String, textCol: String,
                     shards: Int, tokenBudget: Long): DataFrame = {
    require(shards >= 1 && tokenBudget >= 1)
    val shard = pmod(TF.md5Prefix32(col(idCol).cast("string")), lit(shards))
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
