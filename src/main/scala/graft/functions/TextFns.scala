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

  /** Canonical text normalization: lowercase, non-alphanumerics → space,
    * collapse whitespace, trim. DuckDB twin: [[normSql]]. */
  def norm(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

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

  /** Whitespace token count of raw text (split on runs of whitespace). */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  def wsTokenCountSql(field: String): String =
    s"len(string_split_regex(trim($field), '\\s+'))"

  /** BPE-ish sub-token pattern: letter runs, digit runs, single symbols. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
}
