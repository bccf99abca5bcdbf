package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-order (Morton)
  * interleaving maps two query dimensions onto one sort key such that rows
  * close in BOTH dimensions land close in the file layout. Written with
  * parquet min/max page stats (or any file-level zone map), a range predicate
  * on either dimension then skips most files — the lakehouse answer to "we
  * filter this table by two different columns and can only sort by one"
  * (Morton 1966; the layout trick behind Delta/Iceberg OPTIMIZE ZORDER).
  */
object Layout {

  /** Morton z-value of two non-negative integer columns, `bits` low bits
    * each, interleaved into one long: result bit 2i is bit i of `a`, bit
    * 2i+1 is bit i of `b`. Pure bit arithmetic — one codegen'd expression,
    * engine-reproducible, no UDF.
    *
    * Coordinates are taken modulo 2^bits (high bits are DROPPED): z-order is
    * a layout key, so truncation only degrades clustering locality for
    * out-of-range outliers — it never affects query results. Size `bits` to
    * the real coordinate range (31+31 bits fills a long for full ids);
    * negative inputs are a caller error (two's-complement low bits would
    * interleave meaninglessly). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster a table by the z-curve: range-partition on the z-value (so file
    * N holds a contiguous z-range — that contiguity is what makes min/max
    * stats selective on BOTH dimensions) and sort within partitions. One
    * range exchange (sampled bounds, skew-tolerant); the caller writes the
    * result with its usual writer. */
  def zorderLayout(df: DataFrame, a: Column, b: Column, bits: Int = 16,
                   numFiles: Int = 0, zCol: String = "z"): DataFrame = {
    val withZ = df.withColumn(zCol, zValue2(a, b, bits))
    val parted =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col(zCol))
      else withZ.repartitionByRange(col(zCol))
    parted.sortWithinPartitions(col(zCol))
  }
}
