package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector / bitset hot paths. The
  * built-in route (aggregate ∘ zip_with) evaluates one Catalyst lambda per
  * element per row — at N² pair volume that interpretation overhead dominates.
  * These compile to tight primitive loops inside whole-stage codegen.
  *
  * Semantics are bit-identical to the HOF formulation they replace (left-to-
  * right double fold), so DuckDB-oracle parity is preserved.
  */
object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.toColumn(DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  def bitsetFromIndices(indices: Column, numBits: Int): Column =
    GraftBridge.toColumn(BitsetFromIndices(GraftBridge.toExpression(indices), numBits))

  def bitsetIntersectCount(a: Column, b: Column): Column =
    GraftBridge.toColumn(BitsetIntersectCount(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  def nearestCentroid(vec: Column, centroids: Column): Column =
    GraftBridge.toColumn(NearestCentroid(GraftBridge.toExpression(vec), GraftBridge.toExpression(centroids)))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSim(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}

/** dot(a, b) over array<float|double>, accumulated in double, left-to-right
  * (float widening to double is exact; float*float in double is exact).
  * Arrays of unequal length use the shorter length; null elements are read as
  * 0 (embeddings never contain null elements). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"dotProduct needs array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity over array<float|double>: one pass accumulates
  * dot(a,b), ||a||², and ||b||² together instead of the composed
  * `dot/(sqrt(dot)·sqrt(dot))` column form, whose zero-norm `when` guard
  * re-embeds the norm subtrees in both the condition and the result branch
  * (conditional branches defeat Catalyst's subexpression elimination) — up
  * to FIVE O(dims) traversals per row on the brute-force kNN hot path.
  *
  * Bit-identical to the composed form by construction: each accumulator is
  * an independent left-to-right double sum (interleaving loops does not
  * change per-accumulator IEEE order), xy runs over the SHORTER length
  * while xx/yy run over their own array's full length (dot(a,a) semantics),
  * and a zero norm yields NULL, never NaN. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"cosineSim needs array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n1 = x.numElements(); val n2 = y.numElements()
    val nMin = math.min(n1, n2); val nMax = math.max(n1, n2)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < nMax) {
      if (i < n1) { val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i); xx += xv * xv }
      if (i < n2) { val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i); yy += yv * yv }
      if (i < nMin) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        xy += xv * yv
      }
      i += 1
    }
    val na = math.sqrt(xx); val nb = math.sqrt(yy)
    if (na == 0.0 || nb == 0.0) null else (xy / (na * nb)): java.lang.Double
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val nMin = ctx.freshName("nMin"); val nMax = ctx.freshName("nMax")
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $n1 = $a.numElements(); int $n2 = $b.numElements();
        int $nMin = java.lang.Math.min($n1, $n2);
        int $nMax = java.lang.Math.max($n1, $n2);
        double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
        for (int $i = 0; $i < $nMax; $i++) {
          if ($i < $n1) { double $xv = (double) $a.$lGet($i); $xx += $xv * $xv; }
          if ($i < $n2) { double $yv = (double) $b.$rGet($i); $yy += $yv * $yv; }
          if ($i < $nMin) {
            $xy += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
          }
        }
        double $na = java.lang.Math.sqrt($xx);
        double $nb = java.lang.Math.sqrt($yy);
        if ($na == 0.0 || $nb == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $xy / ($na * $nb);
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Pack an array<int> of set-bit positions into a fixed-width array<long>
  * bitset (word i holds bits [64i, 64i+64)). Out-of-range indices ignored.
  * Runs once per document (not in the N² pair loop), so interpreted eval
  * (CodegenFallback) costs nothing measurable. */
case class BitsetFromIndices(child: Expression, numBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private val numWords = (numBits + 63) / 64
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val idx = v.asInstanceOf[ArrayData]
    val words = new Array[Long](numWords)
    var i = 0
    val n = idx.numElements()
    while (i < n) {
      val s = idx.getInt(i)
      if (s >= 0 && s < numBits) words(s >> 6) |= (1L << (s & 63))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** popcount(a AND b) over two array<long> bitsets (shorter length wins). */
case class BitsetIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** argmin_cluster ||v - c||² over a broadcast centroid array — the k-means
  * assignment hot loop as ONE expression call per row instead of k·D
  * interpreted Catalyst lambdas (the HOF aggregate∘zip_with form costs
  * rows·k·D lambda evaluations; at sf1 with auto-k that measured 226 s for
  * q73 vs seconds here — same asymptotics, ~50× the constant).
  *
  * Bit-identical to the HOF fold it replaces (Clustering.assign): d² folds
  * left-to-right over dims in double (float widened per element), centroids
  * are visited in array order (ascending cluster id — the caller sorts),
  * replacement only on strictly smaller d², so ties keep the lower cluster.
  * A centroid whose dims mismatch the vector (zip_with would null-pad) is
  * skipped exactly as the HOF's null d² is; no valid centroid → NULL result
  * (the caller raises, matching the HOF's cluster = -1 sentinel).
  *
  * `vec`: array<float|double>; `centroids`: array<struct<cluster:int,
  * c:array<double>>>. Interpreted eval (CodegenFallback) is deliberate:
  * one JVM call per row running a primitive k·D loop — the lambda
  * interpretation overhead was the cost, not the codegen boundary. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType), StructField("cluster", IntegerType)))

  // nullSafeEval returns null when NO centroid yields a finite distance
  // (ragged dims / null elements) — without this override a non-nullable
  // input pair would let codegen treat the result as never-null and NPE in
  // the downstream GetStructField instead of reaching the caller's
  // raise_error diagnostic
  override def nullable: Boolean = true

  // lazy: children are unresolved at construction time (dataType would
  // throw); first eval happens post-analysis where the type is known
  private lazy val vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearestCentroid needs array<float|double> vector, got $other")
  }

  override def nullSafeEval(v: Any, cents: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cs = cents.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var bestD = Double.MaxValue
    var bestC = -1
    var ci = 0
    val k = cs.numElements()
    while (ci < k) {
      if (!cs.isNullAt(ci)) {
        val cent = cs.getStruct(ci, 2)
        val cv = cent.getArray(1)
        if (cv.numElements() == n) {
          var d2 = 0.0
          var i = 0
          var ok = true
          while (ok && i < n) {
            // a null ELEMENT nulls the whole distance (zip_with semantics) —
            // reading it as 0.0 would silently assign a wrong cluster where
            // the HOF fallback raises, breaking the parity contract
            if (vec.isNullAt(i) || cv.isNullAt(i)) ok = false
            else {
              val x = (if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)) -
                cv.getDouble(i)
              d2 += x * x
              i += 1
            }
          }
          if (ok && d2 < bestD) { bestD = d2; bestC = cent.getInt(0) }
        }
      }
      ci += 1
    }
    if (bestC < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
