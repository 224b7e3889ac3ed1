package graft.functions

import scala.collection.mutable

/** Real byte-pair-encoding (Sennrich et al. 2016, the GPT-2 tokenizer
  * family's algorithm): train a ranked merges table from word frequencies,
  * then encode by greedily applying the lowest-ranked merge present until
  * none applies. Training-data pipelines budget by REAL tokenizer counts —
  * the `text_tokens` operator's regex approximation (SURVEY §2 #36) can be
  * off by 2-4× on code/markup-heavy corpora, which at 100 TB is the
  * difference between a right-sized and a half-sized training run.
  *
  * Scale split (the IVF-centroids pattern, queries/Ann.scala): the MERGES
  * TABLE is the frozen artifact — trained once from a distributed
  * word-frequency aggregation capped to a driver-bounded dictionary, landed
  * to parquet, and broadcast for encoding; the per-document encode is a
  * pure typed pass (no shuffle), linear in corpus size.
  *
  * Base vocabulary is every single character (byte-level-ish: no UNK — a
  * character unseen in training simply stays its own token), so
  * `encodeCount` is total and deterministic for any input.
  */
object Bpe {

  /** Pre-tokenizer: ASCII letter runs, ASCII digit runs, and single
    * other non-whitespace characters — EXACTLY the segmentation of
    * `TextFns.BpeishPattern` ("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]"),
    * so BPE token counts refine the regex operator's pre-token counts
    * (every pre-token encodes to ≥ 1 BPE tokens). Hand-rolled single scan:
    * java.util.regex on the per-document hot path measured 20×+ the cost
    * of a char-class walk on the text family (SURVEY §3a HOF/regex lesson). */
  def preTokens(text: String): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    val n = text.length
    var i = 0
    @inline def isLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    @inline def isDigit(c: Char) = c >= '0' && c <= '9'
    @inline def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i < n) {
      val c = text.charAt(i)
      if (isLetter(c)) {
        val s = i; while (i < n && isLetter(text.charAt(i))) i += 1
        out += text.substring(s, i)
      } else if (isDigit(c)) {
        val s = i; while (i < n && isDigit(text.charAt(i))) i += 1
        out += text.substring(s, i)
      } else {
        // full CODE POINT, not UTF-16 char: java.util.regex's negated char
        // class matches one code point, so a supplementary character (emoji,
        // astral CJK) is ONE regex pre-token — emitting its two surrogate
        // halves separately would double-count it vs the segmentation this
        // walk claims to match exactly
        if (!isWs(c)) {
          val w = if (Character.isHighSurrogate(c) && i + 1 < n &&
            Character.isLowSurrogate(text.charAt(i + 1))) 2 else 1
          out += text.substring(i, i + w)
          i += w
        } else i += 1
      }
    }
    out.toList
  }

  /** Train `numMerges` ranked merges from a word-frequency dictionary
    * (exactly how sentencepiece/HF tokenizers train: over word TYPES
    * weighted by count, never over the raw corpus). Deterministic: ties on
    * pair frequency break to the lexicographically smallest (left, right)
    * pair, and the input dictionary order is irrelevant. Stops early when
    * no pair reaches `minPairFreq`.
    *
    * Cost: the per-iteration recount is O(total symbols) over the CAPPED
    * dictionary (≤ dictCap word types), keyed by packed int pairs in a
    * LongMap (no tuple boxing) — one-time work behind the frozen-parquet
    * cache, a few seconds at the default 1024 merges / 32k words. */
  def train(
      wordFreqs: Seq[(String, Long)],
      numMerges: Int,
      minPairFreq: Long = 2L): Array[(String, String)] = {
    // symbol interning: id ↔ string
    val symOf = mutable.HashMap.empty[String, Int]
    val syms = mutable.ArrayBuffer.empty[String]
    def intern(s: String): Int = symOf.getOrElseUpdate(s, { syms += s; syms.length - 1 })
    val words: Array[Array[Int]] =
      wordFreqs.iterator.map(w => codePointStrings(w._1).map(intern)).toArray
    val freqs: Array[Long] = wordFreqs.iterator.map(_._2).toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]

    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      // recount all adjacent pairs, weighted by word frequency
      val counts = mutable.LongMap.empty[Long]
      var w = 0
      while (w < words.length) {
        val a = words(w); val f = freqs(w)
        var i = 0
        while (i + 1 < a.length) {
          val key = (a(i).toLong << 32) | (a(i + 1).toLong & 0xffffffffL)
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
        w += 1
      }
      // best pair: max count, ties to the lexicographically smallest pair —
      // full determinism regardless of hash iteration order
      var bestKey = -1L; var bestCnt = 0L; var bestL = ""; var bestR = ""
      counts.foreachEntry { (key, cnt) =>
        if (cnt >= minPairFreq) {
          val l = syms((key >>> 32).toInt); val r = syms(key.toInt)
          val better = cnt > bestCnt ||
            (cnt == bestCnt && (l < bestL || (l == bestL && r < bestR)))
          if (better) { bestKey = key; bestCnt = cnt; bestL = l; bestR = r }
        }
      }
      if (bestKey < 0L) done = true
      else {
        merges += ((bestL, bestR))
        val li = (bestKey >>> 32).toInt; val ri = bestKey.toInt
        val ni = intern(bestL + bestR)
        // rewrite every word: replace occurrences of (li, ri) left-to-right
        var w2 = 0
        while (w2 < words.length) {
          val a = words(w2)
          if (a.length >= 2) {
            var i = 0; var j = 0; var changed = false
            val out = new Array[Int](a.length)
            while (i < a.length) {
              if (i + 1 < a.length && a(i) == li && a(i + 1) == ri) {
                out(j) = ni; i += 2; changed = true
              } else { out(j) = a(i); i += 1 }
              j += 1
            }
            if (changed) words(w2) = java.util.Arrays.copyOf(out, j)
          }
          w2 += 1
        }
        iter += 1
      }
    }
    merges.toArray
  }

  /** One string per CODE POINT of `s` — the base-symbol split shared by
    * train and encode. Code points, not UTF-16 chars: a lone surrogate
    * half is not a character (and would diverge from [[preTokens]]'
    * code-point segmentation), so a supplementary character is one base
    * symbol. */
  private def codePointStrings(s: String): Array[String] = {
    val out = new Array[String](s.codePointCount(0, s.length))
    var i = 0; var j = 0
    while (i < s.length) {
      val w = Character.charCount(s.codePointAt(i))
      out(j) = s.substring(i, i + w)
      i += w; j += 1
    }
    out
  }

  /** Merge ranks for encoding: (left, right) → rank (lower merges first). */
  def ranksOf(merges: Array[(String, String)]): Map[(String, String), Int] =
    merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Number of BPE tokens one pre-token encodes to: start from single
    * characters, repeatedly apply the present pair with the LOWEST rank
    * (all its occurrences, left-to-right) until no ranked pair remains —
    * the exact GPT-2-family encode loop. Total: a char unseen in training
    * never merges and stays one token (byte-level-ish base vocab, no UNK). */
  def encodeCount(word: String, ranks: Map[(String, String), Int]): Int = {
    if (word.length <= 1) return word.length
    var parts: Array[String] = codePointStrings(word)
    if (parts.length == 1) return 1 // a single supplementary code point
    var continue = true
    while (continue && parts.length >= 2) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var i = 0
      while (i + 1 < parts.length) {
        ranks.get((parts(i), parts(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        val l = parts(bestAt); val r = parts(bestAt + 1); val m = l + r
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < parts.length) {
          if (j + 1 < parts.length && parts(j) == l && parts(j + 1) == r) {
            out += m; j += 2
          } else { out += parts(j); j += 1 }
        }
        parts = out.toArray
      }
    }
    parts.length
  }

  /** BPE token count of a whole document: pre-tokenize, encode each
    * pre-token, sum — with a per-call word cache (natural-language word
    * frequency is Zipfian, so the cache hit rate is high; callers reuse one
    * cache per partition). `cache` is bounded by the caller clearing it;
    * encode cost per MISS is O(len²·merges-present) on ≤ ~40-char words. */
  def countTokens(
      text: String,
      ranks: Map[(String, String), Int],
      cache: java.util.HashMap[String, Integer],
      cacheCap: Int = 1 << 16): Long = {
    var total = 0L
    preTokens(text).foreach { w =>
      val hit = cache.get(w)
      if (hit != null) total += hit.toLong
      else {
        val c = encodeCount(w, ranks)
        if (cache.size < cacheCap) cache.put(w, c)
        total += c.toLong
      }
    }
    total
  }
}
