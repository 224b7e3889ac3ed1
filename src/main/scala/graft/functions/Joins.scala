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
  /** Working-column names the helpers claim internally; a user column with
    * one of these names would be silently overwritten then dropped (or fail
    * analysis as ambiguous) — refuse loudly instead. */
  private def requireNoReserved(probe: DataFrame, build: DataFrame, names: String*): Unit = {
    val clash = (probe.columns ++ build.columns).toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"salted join inputs must not carry reserved working columns ${clash.mkString(", ")} — rename them first")
  }

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    require(factor > 1, s"salt factor must be > 1, got $factor")
    requireNoReserved(probe, build, "__salt")
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

  /** Hot-KEY salted inner equi-join: [[saltedJoin]] replicates the whole
    * build side ×factor unconditionally; this variant pays replication ONLY
    * for keys that are actually hot. Probe-side per-key counts (a tiny
    * map-side-combined aggregate — one output row per distinct key) pick
    * the keys above `hotThreshold`; that set is broadcast (bounded by
    * |probe|/hotThreshold rows). Hot-key probe rows spread over `factor`
    * sub-buckets via `saltExpr` (any deterministic per-row expression, e.g.
    * an event timestamp), hot-key build rows replicate to all `factor`
    * sub-buckets; cold keys keep salt 0 on both sides — so every matching
    * pair still meets exactly once and the RESULT is bit-identical to the
    * plain join, only the partitioning changes.
    *
    * Cost/trade: the count pass re-scans the (narrow, filter-pruned) probe
    * columns once — the insurance premium against a bursty key turning
    * into one |probe_k|·|build_k| task at 100 TB. AQE's skew-join split
    * covers the sort-merge case at runtime; this keeps the worst case
    * bounded when both sides of one key burst together (incident storms),
    * when AQE is off, or when the join degenerates to a broadcast. */
  def hotSaltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltExpr: Column, hotThreshold: Long, factor: Int): DataFrame =
    hotSaltedJoinKeepSalt(probe, build, keys, saltExpr, hotThreshold, factor).drop("__salt")

  /** [[hotSaltedJoin]] keeping the internal `__salt` column — exposed so
    * tests can assert the bounded-group property directly (rows per
    * (keys, salt) group IS the per-task input under hash partitioning). */
  private[graft] def hotSaltedJoinKeepSalt(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltExpr: Column, hotThreshold: Long, factor: Int): DataFrame = {
    require(factor > 1, s"salt factor must be > 1, got $factor")
    require(hotThreshold > 0, s"hot threshold must be > 0, got $hotThreshold")
    requireNoReserved(probe, build, "__salt", "__hot", "__cnt")
    val keyCols = keys.map(col)
    val hot = probe.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotThreshold)
      .select(keyCols :+ lit(true).as("__hot"): _*)
    val saltedProbe = probe.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        // coalesce: a NULL saltExpr (nullable timestamp, say) would make
        // __salt NULL on a hot-key probe row and the inner equi-join below
        // would DROP it — breaking the bit-identical-to-plain-join
        // contract. NULL-salt rows deterministically take cell 0, which
        // the hot build side always replicates into.
        when(col("__hot").isNotNull,
          coalesce(pmod(saltExpr, lit(factor.toLong)).cast("int"), lit(0)))
          .otherwise(lit(0)))
      .drop("__hot")
    val saltedBuild = build.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        explode(when(col("__hot").isNotNull, sequence(lit(0), lit(factor - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    saltedProbe.join(saltedBuild, keys :+ "__salt")
  }
}
