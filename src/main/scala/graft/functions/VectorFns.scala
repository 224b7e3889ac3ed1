package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (SURVEY §2 #31-33).
  *
  * Dot/cosine are native codegen'd Catalyst expressions
  * ([[graft.functions.DotProduct]] / [[graft.functions.CosineSimilarity]]):
  * strict left-to-right double accumulation, so a given pair of vectors
  * produces one deterministic similarity value, at whole-stage-codegen
  * speed (the HOF `aggregate(zip_with(...))` formulation runs interpreted).
  * Only ids/ranks derived from similarities are hash-compared cross-engine —
  * raw float sums never are (DuckDB may associate differently; ~1e-16 noise
  * is harmless to ranking but not to a byte-exact hash).
  */
object VectorFns {

  private def ec(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def cc(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  /** array<float> → array<double>. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — native expression, deterministic left fold. */
  def dot(a: Column, b: Column): Column = cc(DotProduct(ec(a), ec(b)))

  /** Cosine similarity — native fused single-pass expression. */
  def cosine(a: Column, b: Column): Column = cc(CosineSimilarity(ec(a), ec(b)))

  /** Bounded top-k aggregate (k largest doubles per group, descending
    * array) — native size-k heap, see [[TopKDoubles]]. */
  def topK(v: Column, k: Int): Column =
    cc(TopKDoubles(ec(v), k).toAggregateExpression())

  /** Dot product against a fixed plane (driver-side constant weights). */
  def dotConst(v: Column, weights: Array[Double]): Column =
    dot(v, array(weights.map(lit).toIndexedSeq: _*))

  /** 16-bit hyperplane-LSH bucket key: one sign bit per plane, concatenated
    * to a 16-char 0/1 string. Planes are deterministic pseudo-random unit-free
    * weights seeded once — identical vectors (and positive scalings of them)
    * always share a bucket, so exact-duplicate recall is 100%. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    concat(planes.toIndexedSeq.map(p => when(dotConst(v, p) > 0, lit("1")).otherwise(lit("0"))): _*)

  /** Deterministic hyperplane weights: `nPlanes` x `dim`, seeded. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextDouble() * 2.0 - 1.0)
  }
}
