package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** F1-F4/F15 branch coverage per FIXTURES.md §3 + property round-trips
  * (SURVEY §5: format_cents ∘ to_cents identity). */
class MoneyFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def toCents(s: String): Any =
    Seq(s).toDF("v").select(MoneyFunctions.toCents(col("v"))).head().get(0)

  test("to_cents branches match the reference (steam_transform_price.py:9-30)") {
    assert(toCents("12,34") == 1234L)   // comma decimal
    assert(toCents("1.234") == 123L)    // dot branch: float*100, banker's round
    assert(toCents("12.34") == 1234L)
    assert(toCents("1234") == 1234L)    // bare int IS cents
    assert(toCents("") == null)
    assert(toCents("  ") == null)
    assert(toCents("abc") == null)
    assert(toCents("1.234,56") == null) // both separators -> float() fails
    assert(toCents("0") == 0L)
    assert(toCents("19,99") == 1999L)
  }

  test("format_cents formats and NULL -> empty string") {
    val out = Seq[(java.lang.Long, String)]((1234L, "a"), (5L, "b"), (null, "c"))
      .toDF("c", "k").select(MoneyFunctions.formatCents(col("c"))).as[String].collect()
    assert(out.toSeq == Seq("12,34", "0,05", ""))
  }

  test("to_cents . format_cents is identity on non-negative cents (property)") {
    val rnd = new scala.util.Random(42)
    val samples = (Seq(0L, 1L, 99L, 100L, 101L) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 10000000L)).distinct
    val out = samples.toDF("c")
      .select(col("c"), MoneyFunctions.toCents(MoneyFunctions.formatCents(col("c"))))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(0), s"cents=${r.getLong(0)}"))
  }

  test("parse_discount strips % and comma, invalid -> 0.0") {
    val out = Seq("50%", "33,33", "bogus", "", "0").toDF("v")
      .select(MoneyFunctions.parseDiscount(col("v"))).as[Double].collect().toSeq
    assert(out == Seq(50.0, 33.33, 0.0, 0.0, 0.0))
  }

  test("initial_price_cents branch cascade incl. denominator guard") {
    val cases = Seq(
      (0L, 50.0, 0L),      // price<=0 -> 0
      (1000L, 0.0, 1000L), // no discount -> price
      (1000L, 50.0, 2000L),
      (1000L, 100.0, 1000L), // denom<=0 guard -> price
      (1000L, 150.0, 1000L))
    val out = cases.map { case (p, d, _) =>
      Seq((p, d)).toDF("p", "d")
        .select(MoneyFunctions.initialPriceCents(col("p"), col("d"))).head().getLong(0)
    }
    assert(out == cases.map(_._3))
  }

  test("format_discount trims integral floats (F15)") {
    val out = Seq(10.0, 33.33).toDF("d")
      .select(MoneyFunctions.formatDiscount(col("d"))).as[String].collect().toSeq
    assert(out == Seq("10", "33.33"))
  }
}
