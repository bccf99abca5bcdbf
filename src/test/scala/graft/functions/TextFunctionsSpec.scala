package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(in).toDF("v").select(c(col("v"))).head().get(0)

  test("stripHtml approximates BS4 get_text(' ', strip=True) (F9)") {
    assert(one("<p>Hello <b>world</b></p>", TextFunctions.stripHtml) == "Hello world")
    assert(one("  no tags  here ", TextFunctions.stripHtml) == "no tags here")
    assert(one("<div><br/></div>", TextFunctions.stripHtml) == "")
  }

  test("cleanArrayString strips list syntax, languages also strip * (F8)") {
    assert(one("['Action', 'RPG']", TextFunctions.cleanArrayString(_)) == "Action, RPG")
    assert(one("['English*', 'French']", TextFunctions.cleanArrayString(_, isLanguage = true))
      == "English, French")
    assert(one("[ 'a' ,, 'b' ]", TextFunctions.cleanArrayString(_)) == "a, b")
  }

  test("tokens / shingles") {
    val t = Seq("a b c d").toDF("v")
    assert(t.select(TextFunctions.tokenCount(col("v"))).head().getLong(0) == 4L)
    val sh2 = t.select(TextFunctions.shingles(col("v"), 2)).head().getSeq[String](0)
    assert(sh2.toSet == Set("a b", "b c", "c d"))
    val sh1 = Seq("x x y").toDF("v")
      .select(TextFunctions.shingles(col("v"), 1)).head().getSeq[String](0)
    assert(sh1.toSet == Set("x", "y")) // distinct
    assert(Seq("").toDF("v").select(TextFunctions.tokenCount(col("v"))).head().getLong(0) == 0L)
  }

  test("preTokenCount splits words / digits / punct runs") {
    assert(one("ab 12, c!", TextFunctions.preTokenCount(_)) == 5L)
  }

  test("fingerprint is case/punct/whitespace invariant") {
    val f1 = one("Hello,  World!", TextFunctions.fingerprint)
    val f2 = one("hello world", TextFunctions.fingerprint)
    val f3 = one("hello there", TextFunctions.fingerprint)
    assert(f1 == f2 && f1 != f3)
  }

  test("langId picks the dominant stopword family, und on no hits") {
    assert(one("the cat and the dog is in a house", TextFunctions.langId) == "en")
    assert(one("der hund und die katze ist nicht ein vogel", TextFunctions.langId) == "de")
    assert(one("le chat est dans la maison pour les enfants", TextFunctions.langId) == "fr")
    assert(one("el perro y el gato es una mascota", TextFunctions.langId) == "es")
    assert(one("xyzzy plugh qwerty", TextFunctions.langId) == "und")
  }

  test("quality score stays in [0,1] and ranks prose above noise") {
    val prose = one("the quick brown fox jumps over the lazy dog and it is a fine day in the park",
      TextFunctions.qualityScore).asInstanceOf[Double]
    val noise = one("!!! ### $$$ %%% ^^^ &&&", TextFunctions.qualityScore).asInstanceOf[Double]
    assert(prose >= 0 && prose <= 1 && noise >= 0 && noise <= 1)
    assert(prose > noise)
  }
}
