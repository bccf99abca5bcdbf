package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>`), all as codegen'd
  * expression trees. Elementwise ops cast float->double (exact) and fold
  * left-to-right, so results are bit-deterministic and reproducible across
  * engines — float*float is exact in double (24+24 < 53 mantissa bits).
  */
object VectorFunctions {

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm (double). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; NULL if either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(d / (na * nb))
  }

  /** Sign-random-projection bucket id for LSH over embeddings: `planes` is a
    * fixed per-plane weight vector; bit p = 1 iff dot(v, plane_p) >= 0. The
    * planes are derived deterministically (no runtime RNG) so bucket ids are
    * stable across runs/executors — see Similarity.hyperplane. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val d = aggregate(
        zip_with(v, typedLit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
