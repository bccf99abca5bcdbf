package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NFC / accent-folding expression semantics + codegen/eval parity. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "Café déjà"          // é as single codepoints
  private val decomposed = "Café déjà"     // e + combining marks

  test("nfcNormalize composes combining marks; idempotent on composed text") {
    val df = Seq((1, composed), (2, decomposed), (3, null)).toDF("id", "s")
      .select(col("id"), TextNormExpressions.nfcNormalize(col("s")).as("n"))
    val out = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == composed)
    assert(out(2) == composed) // decomposed input composes to the same string
    assert(out(3) == null)     // null in, null out
  }

  test("stripAccents folds composed AND decomposed accents; keeps undecomposable chars") {
    val df = Seq((1, composed), (2, decomposed), (3, "ø — ﬁ"))
      .toDF("id", "s")
      .select(col("id"), TextNormExpressions.stripAccents(col("s")).as("n"))
    val out = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "Cafe deja")
    assert(out(2) == "Cafe deja")
    assert(out(3) == "ø — ﬁ") // ø, em dash, fi-ligature pass through
  }

  test("codegen and interpreted eval agree") {
    for (s <- Seq(composed, decomposed, "Müller—Çağrı", "plain ascii", "")) {
      val u = UTF8String.fromString(s)
      // interpreted kernels
      val evalNfc = TextNorm.nfc(u).toString
      val evalStrip = TextNorm.stripAccents(u).toString
      // whole-stage-codegen'd plan over a real column (literals would fold)
      val row = Seq(Tuple1(s)).toDF("s").select(
        TextNormExpressions.nfcNormalize(col("s")),
        TextNormExpressions.stripAccents(col("s"))).head()
      assert(row.getString(0) == evalNfc)
      assert(row.getString(1) == evalStrip)
    }
  }

  test("SQL registration via GraftExtensions") {
    val out = spark.sql(s"SELECT nfc_normalize('$decomposed') AS a, strip_accents('$composed') AS b").head()
    assert(out.getString(0) == composed)
    assert(out.getString(1) == "Cafe deja")
  }
}
