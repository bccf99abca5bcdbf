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
