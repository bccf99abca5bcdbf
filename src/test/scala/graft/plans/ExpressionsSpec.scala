package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the HOF formulation bit-for-bit") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f))).toDF("a", "b")
    val custom = df.select(VectorExpressions.dotProduct(col("a"), col("b"))).head().getDouble(0)
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).head().getDouble(0)
    assert(custom == hof && custom == 4.5)
  }

  test("DotProduct handles mixed float/double arrays and nulls") {
    val mixed = Seq((Seq(2.0f, 4.0f), Seq(0.5, 0.25))).toDF("a", "b")
    assert(mixed.select(VectorExpressions.dotProduct(col("a"), col("b"))).head().getDouble(0) == 2.0)
    val withNull = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(withNull.select(VectorExpressions.dotProduct(col("a"), col("b"))).head().isNullAt(0))
  }

  test("CosineSim matches the composed dot/norm formulation bit-for-bit") {
    // fused vs composed on varied geometry incl. a float/double mix and
    // RAGGED lengths (xy over min, each norm over its OWN array — the
    // dot(a,a) semantics the composed form had)
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val d = VectorExpressions.dotProduct(a, b)
      val na = sqrt(VectorExpressions.dotProduct(a, a))
      val nb = sqrt(VectorExpressions.dotProduct(b, b))
      when(na === 0.0 || nb === 0.0, lit(null).cast("double")).otherwise(d / (na * nb))
    }
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f)),
      (Seq(0.3f, 0.7f), Seq(0.3f, 0.7f)),
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)), // ragged
      (Seq(-1.5f, 2.5f, 0.1f), Seq(4.0f, -0.25f, 8.0f))).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.cosineSim(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("comp")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}"))
    // double-typed side (the SQ dequant path) against a float probe —
    // parity again (sqrt(20)*sqrt(5) is one ulp off 10, so the exact
    // value is 0.999..., identically in both forms)
    val mixed = Seq((Seq(2.0, 4.0), Seq(1.0f, 2.0f))).toDF("a", "b")
    val mr = mixed.select(
      VectorExpressions.cosineSim(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("comp")).head()
    assert(java.lang.Double.doubleToLongBits(mr.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(mr.getDouble(1)))
  }

  test("CosineSim: zero norms are NULL (never NaN); null inputs are NULL") {
    val df = Seq(
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 2.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(0.0f, 0.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f)))).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineSim(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
  }

  test("Bitset round-trip: indices -> bitset -> intersection count") {
    val df = Seq((Seq(0, 3, 64, 100), Seq(3, 64, 99))).toDF("x", "y")
    val out = df.select(VectorExpressions.bitsetIntersectCount(
      VectorExpressions.bitsetFromIndices(col("x"), 128),
      VectorExpressions.bitsetFromIndices(col("y"), 128))).head().getLong(0)
    assert(out == 2) // {3, 64}
  }

  test("expressions survive codegen in a wide pipeline (no fallback errors)") {
    val n = 1000
    val df = (0 until n).map(i => (i.toLong, Seq.tabulate(16)(j => (i + j).toFloat)))
      .toDF("id", "v")
    val s = df.select(sum(VectorExpressions.dotProduct(col("v"), col("v"))).as("s"))
      .head().getDouble(0)
    assert(s > 0)
  }

  test("engine functions are SQL-callable once registered (dot_product)") {
    // getOrCreate() in the shared test JVM reuses the session, so exercise
    // the registry the way GraftExtensions' injectFunction does at build time
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    val v = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }

  test("GraftExtensions applies cleanly to a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws on malformed registration
  }
}
