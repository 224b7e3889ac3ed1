package graft.dv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.meta.Transition

/** Metadata-driven hash view: the Spark re-expression of the reference's
  * `stg.<table>_hash_vw` (mallarddv/datavault/hash_generator.py:69-180).
  *
  * Given a staging DataFrame and the transitions that consume it, produce a
  * DataFrame with, per group:
  *   - `<group>_hk`       for each hub business-key group (`bk`),
  *   - `<group>_hk`       for each link group (`ll` legs resolved to the
  *                          underlying hub bk source fields + `dk` fields),
  *   - `<group>_hashdiff` for each satellite payload group (`f`),
  * on top of the transformed base fields (`transformation` SQL with `#`
  * substituted) and `raw` literal fields.
  *
  * Pure projection — narrow, whole-stage-codegen, no shuffle.
  */
object HashView {

  /** Group consecutive-ordered records preserving first-seen key order
    * (itertools.groupby analogue over pre-sorted input). */
  private def orderedGroupBy[A, K](xs: Seq[A])(key: A => K): Seq[(K, Seq[A])] =
    xs.map(key).distinct.map(k => k -> xs.filter(a => key(a) == k))

  def build(stg: DataFrame, transitions: Seq[Transition], algo: HashGen.Algo = HashGen.Sha1): DataFrame = {
    val records = transitions

    // Base (CTE) fields: transformed source columns referenced by any non-structural transition.
    val baseRecords = records.filter(r =>
      !r.raw && !Set("ll", "sat_delta", "sat_full").contains(r.transferType)
    )
    val baseFields: Seq[(String, Column)] = orderedGroupBy(baseRecords)(_.sourceField).map {
      case (field, rs) =>
        // The base projection exposes one column per source field, so two
        // transitions giving the same field DIFFERENT transformations cannot
        // both be honored — one group would silently hash the other's value.
        // Fail loudly instead (the reference dedups by full expression text).
        val distinctTs = rs.map(_.transformation).distinct
        if (distinctTs.size > 1)
          throw new IllegalArgumentException(
            s"conflicting transformations for source field '$field': " +
              distinctTs.map(_.getOrElse("<identity>")).mkString(" vs "))
        val c = distinctTs.head match {
          case Some(sql) => expr(sql.replace("#", field))
          case None      => col(field)
        }
        field -> c.as(field)
    }
    val rawFields: Seq[(String, Column)] = records.filter(_.raw).map { r =>
      r.sourceField -> lit(r.sourceField).as(r.sourceField)
    }

    val cte = stg.select((baseFields ++ rawFields).map(_._2).toIndexedSeq: _*)

    // Floating columns get canonical decimal stringification inside hashes.
    val floating: Set[String] =
      cte.schema.fields.collect { case f if f.dataType == DoubleType || f.dataType == FloatType => f.name }.toSet
    def hashInput(field: String): Column =
      if (floating(field)) HashGen.stringifyFloating(col(field)) else col(field)

    // Hub hash keys over bk groups.
    val hubGroups = orderedGroupBy(records.filter(_.transferType == "bk"))(_.groupName)
    val hubHashes: Seq[Column] = hubGroups.map { case (g, rs) =>
      HashGen.hashCols(rs.map(r => hashInput(r.sourceField)), algo).as(s"${g}_hk")
    }
    val hubGroupMap: Map[String, Seq[Transition]] = hubGroups.toMap

    // Link hash keys over ll+dk groups; ll legs resolve to the hub group's bk source fields.
    val linkGroups = orderedGroupBy(records.filter(r => r.transferType == "ll" || r.transferType == "dk"))(_.groupName)
    val linkHashes: Seq[Column] = linkGroups.map { case (g, rs) =>
      val inputs = rs.flatMap { r =>
        if (r.transferType == "ll")
          hubGroupMap.getOrElse(
            r.sourceField,
            throw new IllegalArgumentException(s"link group $g references unknown hub group ${r.sourceField}")
          ).map(h => hashInput(h.sourceField))
        else Seq(hashInput(r.sourceField))
      }
      HashGen.hashCols(inputs, algo).as(s"${g}_hk")
    }

    // Satellite hashdiffs over f groups.
    val satGroups = orderedGroupBy(records.filter(_.transferType == "f"))(_.groupName)
    val satHashes: Seq[Column] = satGroups.map { case (g, rs) =>
      HashGen.hashCols(rs.map(r => hashInput(r.sourceField)), algo).as(s"${g}_hashdiff")
    }

    cte.select((hubHashes ++ linkHashes ++ satHashes :+ col("*")).toIndexedSeq: _*)
  }
}
