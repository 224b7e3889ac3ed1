package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders shared by the dedup / quality / language-ID
  * operators (SURVEY §2 #27-37).
  *
  * Every builder here has an exact DuckDB-SQL twin (see the `oracleSql`
  * strings in graft.queries.*) — the pair must stay semantically identical
  * because the driver hash-compares results cross-engine. All are pure
  * per-row projections: narrow, whole-stage-codegen, zero shuffle.
  */
object TextFns {

  private def ec(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def cc(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  /** Canonical text normalization: lowercase, non-alphanumerics → space,
    * collapse whitespace, trim. Native single-scan expression
    * ([[NormalizeText]]) — the two-regex formulation walks every string
    * twice through java.util.regex. DuckDB twin: [[normSql]]. */
  def norm(text: Column): Column = cc(NormalizeText(ec(text)))

  def normSql(field: String): String =
    s"trim(regexp_replace(regexp_replace(lower($field), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** Words of a normalized text (single-space separated by construction). */
  def words(normed: Column): Column = split(normed, " ")

  /** Distinct 3-word shingles of a word array; empty when fewer than 3 words.
    * DuckDB twin: [[shinglesSql]]. */
  def shingles(wordsCol: Column): Column =
    when(
      size(wordsCol) >= 3,
      array_distinct(
        transform(
          sequence(lit(0), size(wordsCol) - 3),
          i =>
            concat_ws(
              " ",
              element_at(wordsCol, i + 1),
              element_at(wordsCol, i + 2),
              element_at(wordsCol, i + 3))))
    ).otherwise(array().cast("array<string>"))

  /** DuckDB: distinct 3-shingles over 1-indexed `words` list. */
  def shinglesSql(wordsField: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($wordsField)-1, 1)), " +
      s"i -> $wordsField[i] || ' ' || $wordsField[i+1] || ' ' || $wordsField[i+2]))"

  /** MinHash signature i over a shingle array: min md5 of salted shingles.
    * DuckDB twin: `list_min(list_transform(sh, s -> md5('i:' || s)))`. */
  def minhashSig(shinglesCol: Column, i: Int): Column =
    array_min(transform(shinglesCol, s => md5(concat(lit(s"$i:"), s))))

  def minhashSigSql(shinglesField: String, i: Int): String =
    s"list_min(list_transform($shinglesField, s -> md5('$i:' || s)))"

  // ------------------------------------------------------------------
  // JVM-side twins for the hot dedup path. The Column versions above use
  // higher-order functions (transform/array_min lambdas), which Spark
  // evaluates INTERPRETED (no codegen) and re-evaluates in the Filter +
  // Project + Generate around an explode — measured 95s for 5k docs at
  // sf0.1 vs <1s of real work. The typed-Dataset pipeline computes each
  // value exactly once per row in plain JVM code; results are
  // byte-identical to the Column/DuckDB versions (verified by the oracle).
  // ------------------------------------------------------------------

  /** Distinct n-word shingles of a normalized text; [[shingles]] twin. */
  def shinglesOf(normed: String, n: Int = 3): Array[String] = {
    if (normed.isEmpty) return Array.empty
    val w = normed.split(' ')
    if (w.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i <= w.length - n) {
      val sb = new java.lang.StringBuilder(w(i))
      var j = 1
      while (j < n) { sb.append(' ').append(w(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  private val HexChars = "0123456789abcdef".toCharArray
  private val Md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lowercase md5 hex — identical to Spark/DuckDB `md5(...)`. Thread-local
    * digest + table-driven hex: this sits in the minhash inner loop
    * (signatures × shingles md5 calls per document). */
  def md5HexOf(s: String): String = {
    val md = Md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Raw md5 digest bytes (16) — for operators that consume md5 BITS
    * (simhash): one digest yields 128 bits instead of one comparison. */
  def md5BytesOf(s: String): Array[Byte] = {
    val md = Md5Local.get()
    md.reset()
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** k min-hash signatures; [[minhashSig]] twin (min md5 of salted shingle). */
  def minhashSigsOf(shingles: Array[String], k: Int): Array[String] = {
    val out = new Array[String](k)
    var i = 0
    while (i < k) {
      var min: String = null
      var j = 0
      while (j < shingles.length) {
        val h = md5HexOf(s"$i:${shingles(j)}")
        if (min == null || h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    out
  }

  /** LSH band keys: md5 over '|'-joined signature rows, `rows` per band. */
  def bandHashesOf(sigs: Array[String], rows: Int): Array[String] = {
    val nBands = sigs.length / rows
    Array.tabulate(nBands)(b => md5HexOf(sigs.slice(b * rows, b * rows + rows).mkString("|")))
  }

  /** Occurrence count of `words` between word boundaries in `lower(text)` —
    * native single-scan twin of `regexp_count(lower(text), '\b(w1|w2|…)\b')`
    * (see [[WordSetCount]]). DuckDB twin stays the regex form. */
  def wordSetCount(text: Column, words: Seq[String]): Column =
    cc(WordSetCount(ec(text), words))

  /** Whitespace token count of raw text (split on runs of whitespace). */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** The SQL twin spells the whitespace class OUT: Java's `\s` (what the
    * Spark `split` above uses) includes vertical tab \x0B, RE2's (DuckDB)
    * does not — a document containing \x0B would count tokens differently
    * per engine under a bare `\s+`. Same rule the URL scrub pattern
    * already follows. */
  def wsTokenCountSql(field: String): String =
    s"len(string_split_regex(trim($field), '[ \\t\\n\\x0b\\f\\r]+'))"

  /** BPE-ish sub-token pattern: letter runs, digit runs, single symbols.
    * ONE literal evaluated by BOTH engines (Spark regexp_count, DuckDB
    * regexp_extract_all), so the whitespace class is explicit — a bare
    * `\s` means different things to java.util.regex and RE2 (\x0B). */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]"
}
