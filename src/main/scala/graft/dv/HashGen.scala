package graft.dv

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** Data Vault hash-key generation.
  *
  * Mirrors the reference semantics (mallarddv/datavault/hash_generator.py:43-46):
  * `sha1(upper(concat_ws('||', coalesce(f::string,''), ...)))` — each business-key /
  * payload field is cast to string, NULL→'', joined with `||`, upper-cased, hashed.
  *
  * The algorithm is pluggable: `sha1` is the reference default; `md5` / `sha256`
  * are offered because downstream verifiers (DuckDB 1.0) lack `sha1`. All are
  * Spark built-in codegen'd expressions — no UDFs in the hot path.
  *
  * Scale note: the hash is a pure per-row projection (narrow, whole-stage
  * codegen), so it costs one pass over the scan with zero shuffle.
  */
object HashGen {
  sealed abstract class Algo(val name: String)
  case object Sha1   extends Algo("sha1")
  case object Md5    extends Algo("md5")
  case object Sha256 extends Algo("sha256")

  object Algo {
    def apply(name: String): Algo = name.toLowerCase match {
      case "sha1"   => Sha1
      case "md5"    => Md5
      case "sha256" => Sha256
      case other    => throw new IllegalArgumentException(s"unknown hash algo: $other")
    }
  }

  /** Reference-compatible stringification of one hash input field:
    * cast to string, NULL→''. */
  def stringify(c: Column): Column = coalesce(c.cast(StringType), lit(""))

  /** Stringification for floating-point fields: routed through decimal(38,4)
    * first, because double→string rendering differs across engines (Java vs
    * C++ shortest-repr) while decimal→string is canonical everywhere. Needed
    * for cross-engine hash equality when a payload field is a double.
    *
    * Precision 38 (the max), not 18: decimal(18,4) overflowed at
    * |v| ≥ 10^14, where Spark's cast NULLs (hashing as '' — every large
    * value and NULL collapsed to ONE hash: distinct hub entities merged,
    * satellite changes never re-versioned) while DuckDB's cast THROWS
    * (crashing the twin instead of matching) — a silent-vs-loud divergence
    * either way. At (38,4) overflow needs |v| ≥ 10^34. The scale-4
    * fraction is the documented canonicalization quantum: payload changes
    * below 0.0001 hash equal BY DESIGN (a hashdiff insensitivity, not a
    * bug — sub-quantum noise must not re-version SCD2 history). */
  def stringifyFloating(c: Column): Column =
    coalesce(c.cast(DecimalType(38, 4)).cast(StringType), lit(""))

  /** `hash(fields)` — the Data Vault key/diff hash over the given columns.
    * Fields must already be stringify-ed ([[stringify]] / [[stringifyFloating]])
    * if NULL-safety or floating canonicalization is required; raw columns are
    * accepted and stringified plainly.
    *
    * Implemented as the fused native [[graft.functions.DvHash]] expression
    * (one buffer pass + thread-local digest) — bit-identical to
    * `hex(digest(upper(concat_ws('||', coalesce(f::string,''), …))))` but
    * without the per-row intermediate copies and per-row
    * MessageDigest.getInstance of the composed built-ins. */
  def hashCols(fields: Seq[Column], algo: Algo = Sha1): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val algoId = algo match {
      case Md5    => graft.functions.DvHashRuntime.Md5
      case Sha1   => graft.functions.DvHashRuntime.Sha1
      case Sha256 => graft.functions.DvHashRuntime.Sha256
    }
    // Plain cast only: DvHash hashes NULL children as '' (the coalesce).
    val exprs = fields.map(f => GraftColumnBridge.expression(f.cast(StringType)))
    GraftColumnBridge.column(graft.functions.DvHash(exprs, algoId))
  }
}
