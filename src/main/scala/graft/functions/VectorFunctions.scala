package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>`), all as codegen'd
  * expression trees. Elementwise ops cast float->double (exact) and fold
  * left-to-right, so results are bit-deterministic and reproducible across
  * engines — float*float is exact in double (24+24 < 53 mantissa bits).
  */
object VectorFunctions {

  /** Dot product of two float/double-array columns, computed in double.
    * Backed by the codegen'd DotProduct expression (graft.plans) — same
    * left-to-right fold as the aggregate∘zip_with formulation it replaced,
    * ~30× faster at pair-join volume. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  /** L2 norm (double). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; NULL if either norm is 0. Backed by the
    * fused CosineSim expression (graft.plans): ONE pass accumulates
    * dot/||a||²/||b||² together — the composed when(dot/sqrt·sqrt) form it
    * replaced re-embedded the norm subtrees in the zero-guard's condition
    * AND result branch (conditional branches defeat subexpression
    * elimination), costing up to five O(dims) traversals per row on the
    * brute-force kNN hot path. Bit-identical per-accumulator IEEE order. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  /** Sign-random-projection bucket id for LSH over embeddings: `planes` is a
    * fixed per-plane weight vector; bit p = 1 iff dot(v, plane_p) >= 0. The
    * planes are derived deterministically (no runtime RNG) so bucket ids are
    * stable across runs/executors — see Similarity.hyperplane. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val d = dot(v, typedLit(plane))
      when(d >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
