package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Whole-operator extension (SURVEY §4 candidate (b) made real): all-pairs
  * cosine similarity with a threshold, as a native plan node.
  *
  * The composed form (broadcast nested-loop join + DotProduct projection) is
  * semantically identical but pays per-pair join-machinery overhead — row
  * copying, condition eval, projection dispatch — which dominates once the
  * pair count hits the tens of millions. This exec broadcasts the (id,
  * vector, norm) triples once and runs the pair scan as a primitive double
  * loop per partition; only above-threshold rows materialize.
  *
  * Numeric contract matches the composed form bit for bit: float->double
  * element widening, left-to-right dot fold, cos = dot/(norm_a*norm_b),
  * rounding via BigDecimal.valueOf(x).setScale(s, HALF_UP) — exactly what
  * Spark's round() does — so DuckDB-oracle parity is preserved.
  *
  * Contract: the corpus must fit a broadcast (it is the brute-force exact
  * path; the LSH/IVF operators are the beyond-broadcast path).
  */
case class AllPairsCosineNode(child: LogicalPlan, threshold: Double, roundScale: Int,
    // output attrs are a constructor param so copy() during plan transforms
    // PRESERVES their exprIds — regenerating them breaks downstream bindings
    output: Seq[Attribute] = Seq(
      AttributeReference("id_a", LongType, nullable = false)(),
      AttributeReference("id_b", LongType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)()))
    extends UnaryNode {
  // child contract: output = (id: long, vec: array<float>)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the exec reads every child column positionally — declare that, or
  // ColumnPruning strips the child schema out from under the node
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class AllPairsCosineExec(child: SparkPlan, threshold: Double, roundScale: Int,
                              output: Seq[Attribute]) extends UnaryExecNode {

  // the output attrs originate here, not from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  private def toVec(row: InternalRow): (Long, Array[Double], Double) = {
    val arr = row.getArray(1)
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    var ss = 0.0
    i = 0
    while (i < n) { ss += v(i) * v(i); i += 1 }
    (row.getLong(0), v, math.sqrt(ss))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // One scan: the corpus is collected for the broadcast anyway, so the pair
    // loop runs over strided slices of the broadcast (stride, not ranges —
    // balances the triangular i<j workload across tasks).
    val corpus = child.executeCollect().map(toVec)
    val bc = sparkContext.broadcast(corpus)
    val th = threshold
    val scale = roundScale
    // HALF_UP rounding at `scale` can raise a value by at most half an ulp of
    // that scale; anything below th - that margin cannot round up to >= th, so
    // the reject path (the overwhelming majority) never allocates a BigDecimal
    val preTh = th - (0.5 * math.pow(10, -scale) + 1e-12)
    val slices = math.max(1, math.min(sparkContext.defaultParallelism, corpus.length))
    sparkContext.parallelize(0 until slices, slices).mapPartitions { sliceIt =>
      val all = bc.value
      val proj = UnsafeProjection.create(Array[DataType](LongType, LongType, DoubleType))
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      sliceIt.flatMap { slice =>
        Iterator.range(slice, all.length, slices).flatMap { ia =>
          val (idA, va, na) = all(ia)
          if (na == 0.0) Iterator.empty
          else Iterator.range(0, all.length)
            .filter { ib => all(ib)._1 > idA && all(ib)._3 != 0.0 }
            .flatMap { ib =>
              val (idB, vb, nb) = all(ib)
              var dot = 0.0
              val n = math.min(va.length, vb.length)
              var i = 0
              while (i < n) { dot += va(i) * vb(i); i += 1 }
              val cos = dot / (na * nb)
              if (cos < preTh) Iterator.empty
              else {
                // identical to Spark round(): BigDecimal.valueOf = canonical repr
                val rounded = java.math.BigDecimal.valueOf(cos)
                  .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
                if (rounded >= th) {
                  out.update(0, idA); out.update(1, idB); out.update(2, rounded)
                  Iterator.single(proj(out).copy(): InternalRow)
                } else Iterator.empty
              }
            }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Bitset sibling of AllPairsCosineNode: all pairs with word-set Jaccard >=
  * threshold, child contract (id: long, bits: array<long>, n: long). */
case class AllPairsJaccardNode(child: LogicalPlan, threshold: Double, roundScale: Int,
    output: Seq[Attribute] = Seq(
      AttributeReference("doc_a", LongType, nullable = false)(),
      AttributeReference("doc_b", LongType, nullable = false)(),
      AttributeReference("jaccard", DoubleType, nullable = false)()))
    extends UnaryNode {
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class AllPairsJaccardExec(child: SparkPlan, threshold: Double, roundScale: Int,
                               output: Seq[Attribute]) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  private def toBits(row: InternalRow): (Long, Array[Long], Long) = {
    val arr = row.getArray(1)
    val m = arr.numElements()
    val w = new Array[Long](m)
    var i = 0
    while (i < m) { w(i) = arr.getLong(i); i += 1 }
    (row.getLong(0), w, row.getLong(2))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val corpus = child.executeCollect().map(toBits)
    val bc = sparkContext.broadcast(corpus)
    val th = threshold
    val scale = roundScale
    // same prefilter as the cosine exec: below th minus half an ulp of the
    // rounding scale can never round up past th — skip the BigDecimal
    val preTh = th - (0.5 * math.pow(10, -scale) + 1e-12)
    val slices = math.max(1, math.min(sparkContext.defaultParallelism, corpus.length))
    sparkContext.parallelize(0 until slices, slices).mapPartitions { sliceIt =>
      val all = bc.value
      val proj = UnsafeProjection.create(Array[DataType](LongType, LongType, DoubleType))
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      sliceIt.flatMap { slice =>
        Iterator.range(slice, all.length, slices).flatMap { ia =>
          val (idA, wa, na) = all(ia)
          Iterator.range(0, all.length)
            .filter(ib => all(ib)._1 > idA)
            .flatMap { ib =>
              val (idB, wb, nb) = all(ib)
              var inter = 0L
              val m = math.min(wa.length, wb.length)
              var i = 0
              while (i < m) { inter += java.lang.Long.bitCount(wa(i) & wb(i)); i += 1 }
              if (inter == 0L) Iterator.empty
              else {
                val j = inter.toDouble / (na + nb - inter)
                if (j < preTh) Iterator.empty
                else {
                  val rounded = java.math.BigDecimal.valueOf(j)
                    .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
                  if (rounded >= th) {
                    out.update(0, idA); out.update(1, idB); out.update(2, rounded)
                    Iterator.single(proj(out).copy(): InternalRow)
                  } else Iterator.empty
                }
              }
            }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object AllPairsStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AllPairsCosineNode =>
      AllPairsCosineExec(planLater(n.child), n.threshold, n.roundScale, n.output) :: Nil
    case n: AllPairsJaccardNode =>
      AllPairsJaccardExec(planLater(n.child), n.threshold, n.roundScale, n.output) :: Nil
    case _ => Nil
  }
}

object AllPairsCosine {
  /** True when the session was built with GraftExtensions (the strategy is
    * injected there); the composed fallback stays correct without it. */
  def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.native.allpairs", "false") == "true"

  def pairs(emb: DataFrame, idCol: String, vecCol: String,
            threshold: Double, roundScale: Int = 6): DataFrame = {
    val child = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    GraftBridge.ofRows(emb.sparkSession,
      AllPairsCosineNode(child.queryExecution.analyzed, threshold, roundScale))
  }

  /** docBits contract: (id, bits array<long>, n long). */
  def jaccardPairs(docBits: DataFrame, idCol: String, bitsCol: String, nCol: String,
                   threshold: Double, roundScale: Int = 6): DataFrame = {
    val child = docBits.select(col(idCol).cast("long").as("id"),
      col(bitsCol).as("bits"), col(nCol).cast("long").as("n"))
    GraftBridge.ofRows(docBits.sparkSession,
      AllPairsJaccardNode(child.queryExecution.analyzed, threshold, roundScale))
  }
}
