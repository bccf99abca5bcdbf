package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Money / price scalar functions re-expressing the reference's locale-aware
  * parsing (reference: etl/transform/steam_transform_price.py:9-63, duplicated at
  * tasks/steam_tasks_improved.py:322-339 and utils/your_module.py:86-95).
  *
  * All builders are pure `Column` expression trees (whole-stage-codegen'd) — no
  * UDFs on the hot path. Python's round() is round-half-to-even, so `bround`
  * (HALF_EVEN), not `round` (HALF_UP), mirrors it.
  *
  * NOTE: these parsers rely on non-ANSI cast semantics (bad string -> NULL,
  * like the reference's try/except -> None). Sessions must set
  * spark.sql.ansi.enabled=false (Verify/Bench/test builders all do).
  */
object MoneyFunctions {

  /** F1 `to_cents` (steam_transform_price.py:9-30), branch-for-branch:
    *  - null/""                      -> NULL
    *  - has ',' and no '.'           -> ','->'.' then round(float*100)   ("12,34" -> 1234)
    *  - has '.' (incl. ','+'.' mix)  -> round(float*100); parse fail -> NULL ("1.234" -> 123)
    *  - else plain integer string    -> int(s) AS-IS (already cents)    ("1234" -> 1234)
    */
  def toCents(s: Column): Column = {
    val t = trim(s.cast("string"))
    val hasComma = t.contains(",")
    val hasDot = t.contains(".")
    when(t.isNull || t === "", lit(null).cast(LongType))
      .when(hasComma && !hasDot,
        bround(regexp_replace(t, ",", ".").cast("double") * 100, 0).cast(LongType))
      .when(hasDot, bround(t.cast("double") * 100, 0).cast(LongType))
      .otherwise(t.cast(LongType))
  }

  /** F2 `format_cents`: cents -> "E,CC" comma-decimal string; NULL -> ''. */
  def formatCents(cents: Column): Column =
    when(cents.isNull, lit(""))
      .otherwise(format_string("%d,%02d",
        floor(cents / 100).cast(LongType), pmod(cents, lit(100)).cast(LongType)))

  /** F3 `parse_discount`: strip '%', ','->'.', float; invalid/null -> 0.0. */
  def parseDiscount(s: Column): Column =
    coalesce(
      regexp_replace(regexp_replace(trim(s.cast("string")), "%", ""), ",", ".").cast("double"),
      lit(0.0))

  /** F4 `initial_price_cents(price_cents, discount_pct)`
    * (steam_transform_price.py:50-63): null -> null; price<=0 -> 0;
    * d<=0 -> price; denom=1-d/100<=0 -> price; else round(price/denom). */
  def initialPriceCents(priceCents: Column, discountPct: Column): Column = {
    val d = discountPct.cast("double")
    val denom = lit(1.0) - d / 100.0
    when(priceCents.isNull, lit(null).cast(LongType))
      .when(priceCents <= 0, lit(0L))
      .when(d <= 0, priceCents.cast(LongType))
      .when(denom <= 0, priceCents.cast(LongType))
      .otherwise(bround(priceCents.cast("double") / denom, 0).cast(LongType))
  }

  /** F15 discount float formatting: 10.0 -> "10", 33.33 -> "33.33". */
  def formatDiscount(d: Column): Column =
    when(pmod(d, lit(1.0)) === 0.0, d.cast(LongType).cast("string"))
      .otherwise(d.cast("string"))
}
