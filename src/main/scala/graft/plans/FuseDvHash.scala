package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, ConcatWs, Expression, Literal, Md5, Sha1, Sha2, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DvHash, DvHashRuntime}

/** Optimizer rule: rewrite the canonical Data Vault hash pattern
  *
  * {{{ md5(upper(concat_ws('||', coalesce(f1, ''), coalesce(f2, ''), …))) }}}
  *
  * (and its sha1/sha256 variants) into the fused native [[DvHash]]
  * expression — one buffer pass, reused thread-local digest — so users
  * writing plain `spark.sql` against the vault get the same hot-loop
  * expression the Scala loaders build directly. Reference semantics:
  * mallarddv/datavault/hash_generator.py:43-46.
  *
  * Soundness: DvHash hashes NULL children as '' with separators KEPT —
  * exactly `concat_ws`-over-`coalesce(f, '')`. A nullable field WITHOUT the
  * coalesce wrap is NOT equivalent (`concat_ws` skips null arguments and
  * their separators entirely), so such patterns are left untouched; a
  * non-nullable field needs no wrap and fuses directly. The rewrite runs in
  * the optimizer's fixed-point batch; DvHash never re-matches the pattern,
  * so it fires once per site. */
object FuseDvHash extends Rule[LogicalPlan] {

  private val Sep = UTF8String.fromString("||")

  /** The hashable field inside one concat_ws argument, if the argument has
    * coalesce(f,'')-equivalent null behavior. */
  private def fusableField(e: Expression): Option[Expression] = e match {
    case Coalesce(Seq(f, Literal(s: UTF8String, StringType)))
        if s != null && s.numBytes() == 0 && f.dataType == StringType =>
      Some(f)
    case f if f.dataType == StringType && !f.nullable => Some(f)
    case _ => None
  }

  private def fuse(inner: Expression, algo: Int): Option[Expression] = inner match {
    case Upper(ConcatWs(Literal(sep: UTF8String, StringType) +: fields))
        if sep == Sep && fields.nonEmpty =>
      val inners = fields.map(fusableField)
      if (inners.forall(_.isDefined)) Some(DvHash(inners.map(_.get), algo)) else None
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case orig @ Md5(Cast(inner, BinaryType, _, _)) =>
      fuse(inner, DvHashRuntime.Md5).getOrElse(orig)
    case orig @ Sha1(Cast(inner, BinaryType, _, _)) =>
      fuse(inner, DvHashRuntime.Sha1).getOrElse(orig)
    case orig @ Sha2(Cast(inner, BinaryType, _, _), Literal(256, _)) =>
      fuse(inner, DvHashRuntime.Sha256).getOrElse(orig)
  }
}
