package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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

/** Precompiled ASCII-word dictionary for [[WordSetCount]]: candidate words
  * grouped by length so the scan compares a run only against same-length
  * entries, allocation-free. Words must be lowercase [a-z0-9_]+. */
final class WordDict(words: Seq[String]) extends Serializable {
  require(words.nonEmpty, "empty word set")
  require(words.forall(_.nonEmpty),
    s"WordDict words must be non-empty (an empty word silently never matches): $words")
  require(
    words.forall(_.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_')),
    s"WordDict words must be lowercase ASCII word chars: $words")
  val maxLen: Int = words.map(_.length).max
  // byLen(L) = concatenated byte images of all L-length words (L*k bytes).
  val byLen: Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](maxLen + 1)
    words.groupBy(_.length).foreach { case (l, ws) =>
      out(l) = ws.distinct.sorted.flatMap(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray
    }
    out
  }
}

object WordSetRuntime {

  /** Count of word-char runs of `s.toLowerCase` equal to a dictionary word —
    * byte-identical to `regexp_count(lower(s), '\b(w1|w2|…)\b')` under
    * RE2/DuckDB semantics (the driver oracle), where `\b` is ASCII-only:
    * word chars are [a-zA-Z0-9_], an alternative can only match a maximal
    * such run in its entirety, and after lowercasing the run chars are
    * exactly [a-z0-9_]. Non-ASCII bytes (UTF-8 lead/continuation, always
    * ≥ 0x80) are non-word chars to RE2, so scanning raw bytes is exact.
    *
    * NOTE this deliberately DIVERGES from java.util.regex's `\b`, which is
    * Unicode-aware: Java treats e.g. 𝒳 (U+1D4B3) as a word char, so in
    * `𝒳a` it sees no boundary before `a` while RE2 (and this scan) does.
    * The equivalent Java pattern is the ASCII-boundary lookaround form
    * `(?<![a-z0-9_])(w1|…)(?![a-z0-9_])` on the lowered string. */
  def countWords(s: UTF8String, dict: WordDict): Long = {
    val b = s.toLowerCase.getBytes
    val n = b.length
    var count = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_') {
        val start = i
        i += 1
        while (i < n && {
          val d = b(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9') || d == '_'
        }) i += 1
        val len = i - start
        if (len <= dict.maxLen) {
          val cands = dict.byLen(len)
          if (cands != null) {
            var w = 0
            var found = false
            while (!found && w < cands.length) {
              var j = 0
              while (j < len && b(start + j) == cands(w + j)) j += 1
              if (j == len) found = true else w += len
            }
            if (found) count += 1L
          }
        }
      } else i += 1
    }
    count
  }
}

/** `graft_word_count(text, 'w1,w2,…')` — native occurrence count of
  * dictionary words between word boundaries (see
  * [[WordSetRuntime.countWords]]). Replaces the stopword/language-marker
  * `regexp_count(lower(text), '\b(…)\b')` hot path: one byte scan, no
  * lowercased copy beyond UTF8String's own, no java.util.regex. */
case class WordSetCount(child: Expression, words: Seq[String]) extends UnaryExpression {

  @transient private lazy val dict = new WordDict(words)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordSetRuntime.countWords(input.asInstanceOf[UTF8String], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("wordDict", dict, classOf[WordDict].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.WordSetRuntime.countWords($c, $dictRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)

  override def prettyName: String = "graft_word_count"
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
