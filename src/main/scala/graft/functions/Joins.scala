package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant join helpers (SURVEY §4).
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it can't help when one hot key dominates a single task's
  * build side or when AQE is off. [[saltedJoin]] is the explicit fallback:
  * the probe (skewed) side gets a uniform salt in [0, factor), the build
  * side is replicated `factor` times, and the join key becomes
  * (keys..., salt) — the hot key's rows now spread over `factor` tasks.
  *
  * Cost model: build side grows ×factor (use for small-to-medium build
  * sides that are too big to broadcast but fine to replicate), probe side
  * is untouched. Result is identical to the plain join — the salt is a
  * partitioning detail, never a semantic one.
  */
object Joins {

  /** Inner equi-join of `probe` (skewed side) with `build` on `keys`,
    * salted with `factor` buckets. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    require(factor > 1, s"salt factor must be > 1, got $factor")
    val saltedProbe = probe.withColumn(
      "__salt",
      // Deterministic per-row spread that does NOT depend on the join key —
      // that's the point: one hot key lands in `factor` different buckets.
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(factor)).cast("int"))
    val saltedBuild = build.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedProbe
      .join(saltedBuild, keys :+ "__salt")
      .drop("__salt")
  }
}
