package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT dot_product(a, b)")`
  * works alongside the Column API.
  *
  * Enable with:
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AllPairsStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("bitset_intersect_count"),
      info("bitset_intersect_count", "popcount(a AND b) over two array<long> bitsets"),
      (args: Seq[Expression]) => BitsetIntersectCount(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode canonical composition (NFC)"),
      (args: Seq[Expression]) => NfcNormalize(TextNormExpressions.asString(args(0)))))
    ext.injectFunction((
      FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(s) - accent folding: NFD, drop nonspacing marks, NFC"),
      (args: Seq[Expression]) => StripAccents(TextNormExpressions.asString(args(0)))))
  }
}
