package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Differential fuzz for F1: the Column-expression toCents vs a literal
  * Scala port of the reference's to_cents (steam_transform_price.py:9-30),
  * over generated strings covering every branch and malformed shapes. */
class MoneyFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** Line-by-line port of the Python reference (banker's rounding like
    * Python's round()). */
  private def referencToCents(value: String): Option[Long] = {
    if (value == null) return None
    val s = value.trim
    if (s.isEmpty) return None
    def parse(v: String): Option[Double] =
      try Some(v.toDouble) catch { case _: NumberFormatException => None }
    if (s.contains(',') && !s.contains('.')) {
      val norm = s.replace(".", "").replace(",", ".")
      parse(norm).map(d =>
        BigDecimal(d * 100).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong)
    } else if (s.contains('.')) {
      parse(s).map(d =>
        BigDecimal(d * 100).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong)
    } else {
      try Some(s.toLong) catch { case _: NumberFormatException => None }
    }
  }

  test("toCents matches the reference port on 2000 fuzzed inputs") {
    val rnd = new scala.util.Random(7)
    val shapes = Seq[() => String](
      () => f"${rnd.nextInt(10000)},${rnd.nextInt(100)}%02d",
      () => f"${rnd.nextInt(10000)}.${rnd.nextInt(100)}%02d",
      () => s"${rnd.nextInt(10000)}.${rnd.nextInt(100)}",
      () => s"${rnd.nextInt(100000)}",
      () => s"  ${rnd.nextInt(100)},${rnd.nextInt(10)}  ",
      () => s"${rnd.nextInt(10)}.${rnd.nextInt(1000)}",
      () => s"${rnd.nextInt(10)}.${rnd.nextInt(100)},${rnd.nextInt(100)}", // both seps
      () => "",
      () => "   ",
      () => "abc" + rnd.nextInt(10),
      () => s"${rnd.nextInt(100)}x${rnd.nextInt(100)}",
      () => f"-${rnd.nextInt(1000)},${rnd.nextInt(100)}%02d", // negative comma-decimal
      () => s"-${rnd.nextInt(1000)}")
    val inputs = (1 to 2000).map(_ => shapes(rnd.nextInt(shapes.size))()).distinct
    val got = inputs.toDF("v")
      .select(col("v"), MoneyFunctions.toCents(col("v")))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    got.foreach { case (in, out) =>
      val expected = referencToCents(in)
      assert(out == expected, s"input '$in': spark=$out reference=$expected")
    }
  }
}
