package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-reproducible sketches: Count-Min (Cormode & Muthukrishnan 2005)
  * and HyperLogLog (Flajolet et al. 2007) built on md5-derived hashes, so
  * the sketch CONTENTS — not just the answers — are bit-identical on every
  * engine, every run, and SQL-transcribable for exact oracles. The built-in
  * `Sketches` (approx_count_distinct / percentile_approx / freqItems) stay
  * the production defaults; these variants exist where reproducibility is a
  * requirement (cross-engine validation, incremental sketch stores, audits).
  *
  * Scale shape, both sketches: one explode + groupBy with map-side partial
  * aggregation — the shuffle carries sketch cells (d·w rows for CMS, m rows
  * for HLL), never values. Sketches merge by cell-wise +/max, so per-shard
  * sketches union with a second tiny agg.
  */
object DeterministicSketches {

  /** Row-i hash of a value into [0, width): first 8 md5 hex nibbles of
    * "i_value" — 32 uniform bits, mod width. */
  private def cmBucket(i: Int, value: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"${i}_"), value)), 1, 8), 16, 10)
      .cast("long") % width

  /** Count-Min sketch of token frequencies: d×w counter grid, cell (i, b) =
    * count of tokens hashing to bucket b under row hash i. */
  def countMinSketch(docs: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS geometry ${depth}x$width")
    val toks = docs.select(explode(TF.tokens(col(textCol))).as("tok"))
    val cells = (0 until depth).map(i =>
      struct(lit(i).as("i"), cmBucket(i, col("tok"), width).as("b")))
    toks.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query every distinct token against the sketch: estimate = min
    * over rows of the token's cell. The classic CMS guarantee surfaces as
    * data: est_cnt >= true_cnt always, overestimate bounded by collisions.
    * Join shape: distinct tokens × depth rows against the d·w-row sketch —
    * the sketch side broadcasts at any corpus size. */
  def countMinReport(docs: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 64): DataFrame = {
    val sketch = countMinSketch(docs, textCol, depth, width)
    val toks = docs.select(explode(TF.tokens(col(textCol))).as("tok"))
    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
    val probeCells = (0 until depth).map(i =>
      struct(lit(i).as("i"), cmBucket(i, col("tok"), width).as("b")))
    // true_cnt rides along through the probe explode (constant per tok), so
    // no second join back onto truth — one pass over the aggregate
    truth
      .select(col("tok"), col("true_cnt"), explode(array(probeCells: _*)).as("c"))
      .select(col("tok"), col("true_cnt"), col("c.i").as("i"), col("c.b").as("b"))
      .join(broadcast(sketch), Seq("i", "b"))
      .groupBy(col("tok"))
      .agg(first(col("true_cnt")).as("true_cnt"), min(col("c")).as("est_cnt"))
      .select(col("tok"), col("true_cnt"), col("est_cnt"))
  }

  /** HyperLogLog register table over a key column: m registers, register =
    * low log2(m) bits of the 32-bit md5 hash, value = position of the first
    * set bit of the remaining 26 bits (0 if the register is never hit).
    * Returns all m rows (empty registers included — V, the zero-register
    * count, drives the small-range correction). */
  def hllRegisters(df: DataFrame, keyCol: String, m: Int = 64): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 4096, s"m must be a power of 2, got $m")
    val regBits = java.lang.Integer.numberOfTrailingZeros(m)
    val wBits = 32 - regBits
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    val reg = (h % m).as("reg")
    val w = shiftright(h, regBits).as("w") // wBits uniform bits (integer shift, not `/` — that's double division)
    // rank = leading-zero count within wBits width + 1 (w == 0 -> wBits+1),
    // as a pure integer CASE cascade, highest magnitude first — no log2()
    val rankCol = (1 to wBits).foldRight(lit(wBits + 1): Column) { (r, els) =>
      when(col("w") >= (1L << (wBits - r)), lit(r)).otherwise(els)
    }
    val observed = df.select(reg, w)
      .select(col("reg"), rankCol.as("rank"))
      .groupBy(col("reg")).agg(max(col("rank")).as("m_j"))
    val allRegs = df.sparkSession.range(m).toDF("reg")
    allRegs.join(observed, Seq("reg"), "left")
      .select(col("reg"), coalesce(col("m_j"), lit(0L)).as("m_j"))
  }

  /** One-row HLL distinct-count report with the exact count alongside.
    * Determinism: every 2^-M_j is a multiple of 2^-(wBits+1) and their sum
    * is < m, so all partial sums fit a double mantissa exactly — the
    * indicator sum is order-independent, and the estimate is a single
    * division (plus ln only in the small-range branch). */
  def hllReport(df: DataFrame, keyCol: String, m: Int = 64): DataFrame = {
    val regs = hllRegisters(df, keyCol, m)
    val alpha = 0.7213 / (1.0 + 1.079 / m) // Flajolet et al. 2007, m >= 64
    val agg = regs.agg(
      sum(lit(1.0) /
        expr("shiftleft(CAST(1 AS BIGINT), CAST(m_j AS INT))").cast("double"))
        .as("s"),
      sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("v"))
    val exact = df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
    agg.crossJoin(exact)
      .withColumn("raw", lit(alpha * m * m) / col("s"))
      .withColumn("hll_estimate", round(
        when(col("raw") <= 2.5 * m && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("raw")), 6))
      .select(col("exact_distinct"), col("v").as("zero_registers"),
        col("hll_estimate"))
  }
}
