package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (SURVEY §2 #31-33).
  *
  * All arithmetic is double-precision with a strict left-to-right fold
  * (`aggregate` over `zip_with`), so a given pair of vectors produces one
  * deterministic similarity value. Only ids/ranks derived from similarities
  * are hash-compared cross-engine — raw float sums never are (DuckDB may
  * associate differently; ~1e-16 noise is harmless to ranking but not to a
  * byte-exact hash).
  *
  * Pure projections over array columns — codegen'd, no UDFs, no shuffle.
  */
object VectorFns {

  /** array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product as a sequential left fold — deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Dot product against a fixed plane (driver-side constant weights). */
  def dotConst(v: Column, weights: Array[Double]): Column =
    aggregate(
      zip_with(v, array(weights.map(lit).toIndexedSeq: _*), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

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
