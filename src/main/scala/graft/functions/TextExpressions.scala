package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable runtime for the native text expressions. */
object TextRuntime {

  /** Canonical text normalization in ONE character scan. Byte-identical to
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9\\s]", " "), "\\s+", " "))`
    * (the DuckDB oracle formulation, [[TextFns.normSql]]):
    *
    *  - `lower` is the same UTF8String.toLowerCase Spark's `lower()` calls;
    *  - every non-[a-z0-9] code point (whitespace or not) ends up as a space
    *    after the two regexes, and maximal runs collapse to ONE space —
    *    exactly what the keep/pending-space scan below emits;
    *  - leading/trailing runs are never emitted ≡ the outer trim.
    *
    * The two-regex formulation walks each string twice through java.util.regex
    * with an intermediate copy; this is the hot path of every dedup/fingerprint
    * operator, so it earns a native expression (build rule: native Expression
    * with codegen > composed built-ins > UDF). */
  def normalize(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        started = true
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_norm(text)` — native canonical normalization (see
  * [[TextRuntime.normalize]]). */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextRuntime.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextRuntime.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "graft_norm"
}
