package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFns

/** Property-based invariants for the JVM-side hot-path helpers — these run
  * millions of times per batch, so they get generator coverage beyond the
  * fixed-example specs. (Raw scalacheck sampling: the scalatest bridge
  * artifact isn't in the offline cache.) */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling loop: fixed seed stream, n cases per property. */
  private def forAllGen[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val normText = Gen.listOf(word).map(_.mkString(" "))

  test("shinglesOf: count bounded by words-2, all shingles 3 words, distinct, deterministic") {
    forAllGen(normText) { n =>
      val sh = TextFns.shinglesOf(n)
      val words = if (n.isEmpty) 0 else n.split(' ').count(_.nonEmpty)
      assert(sh.length <= math.max(0, words - 2), s"text='$n'")
      assert(sh.forall(_.split(' ').length == 3))
      assert(sh.toSeq == TextFns.shinglesOf(n).toSeq)
      assert(sh.distinct.length == sh.length)
    }
  }

  test("md5HexOf matches the JDK reference digest for arbitrary strings") {
    forAllGen(Gen.asciiPrintableStr) { s =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(TextFns.md5HexOf(s) == ref, s"input='$s'")
    }
  }

  test("minhash signatures are order-insensitive over the shingle set") {
    forAllGen(Gen.nonEmptyListOf(word).map(_.distinct), n = 100) { shingles =>
      val a = TextFns.minhashSigsOf(shingles.toArray, 4)
      val b = TextFns.minhashSigsOf(new scala.util.Random(7).shuffle(shingles).toArray, 4)
      assert(a.toSeq == b.toSeq)
    }
  }

  test("bandHashesOf: deterministic banded layout") {
    forAllGen(Gen.listOfN(8, word), n = 100) { sigs =>
      val bands = TextFns.bandHashesOf(sigs.toArray, rows = 4)
      assert(bands.length == 2)
      assert(bands.toSeq == TextFns.bandHashesOf(sigs.toArray, rows = 4).toSeq)
    }
  }

  test("TextRuntime.normalize is byte-identical to the two-regex formulation") {
    // Mixed generator: printable ascii, unicode letters, whitespace variants —
    // the corners where a single-scan rewrite could drift from java.util.regex.
    val messy = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "\u00A0"),
      Gen.oneOf("Ärger", "ÇÖĞÜ", "K", "中文", "é", "𝒳𝒴"))).map(_.mkString)
    forAllGen(messy, n = 500) { s =>
      val viaRegex = java.util.regex.Pattern.compile("\\s+")
        .matcher(
          java.util.regex.Pattern.compile("[^a-z0-9\\s]")
            .matcher(org.apache.spark.unsafe.types.UTF8String.fromString(s).toLowerCase.toString)
            .replaceAll(" "))
        .replaceAll(" ").strip()
      val viaScan = graft.functions.TextRuntime
        .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      assert(viaScan == viaRegex, s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("WordSetRuntime.countWords matches ASCII-\\b regexp_count(lower, (..)) — the RE2/DuckDB oracle") {
    val words = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    val dict = new graft.functions.WordDict(words)
    // Reference semantics are RE2/DuckDB's ASCII `\b` (word chars = [a-z0-9_]
    // after lower()), which is what the driver oracle evaluates. Java's `\b`
    // is Unicode-aware and DIVERGES: in `𝒳a`, Java treats 𝒳 (U+1D4B3, a
    // word char to java.util.regex) as extending the run, so it sees no
    // boundary before `a`; RE2 and the production byte scan do. So the
    // reference here is ASCII-boundary lookarounds, not Java's `\b`.
    val pattern = java.util.regex.Pattern.compile(
      s"(?<![a-z0-9_])(${words.mkString("|")})(?![a-z0-9_])")
    // Adversarial mix: the dictionary words themselves, near-misses sharing
    // prefixes/suffixes, digits/underscores extending runs, unicode
    // non-word chars acting as boundaries, uppercase needing the lower().
    val messy = Gen.listOf(Gen.oneOf(
      Gen.oneOf(words),
      Gen.oneOf("THE", "The", "thee", "xthe", "the1", "the_", "_the", "a", "A", "of2", "1of"),
      Gen.asciiPrintableStr,
      Gen.oneOf(" ", "\t", "\n", ",", ".", "-", "中", "é", "K", "𝒳"))).map(_.mkString(""))
    forAllGen(messy, n = 500) { s =>
      val lowered = org.apache.spark.unsafe.types.UTF8String.fromString(s).toLowerCase.toString
      val m = pattern.matcher(lowered)
      var viaRegex = 0L
      while (m.find()) viaRegex += 1
      val viaScan = graft.functions.WordSetRuntime
        .countWords(org.apache.spark.unsafe.types.UTF8String.fromString(s), dict)
      assert(viaScan == viaRegex, s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("TopKDoubles buffer algebra: any update/merge/serialize order equals sorted take-k") {
    // Drive the aggregate's buffer contract directly (no Spark job): split a
    // random value list into random partitions, update each partial through
    // a serialize/deserialize round trip, merge in partition order, then
    // compare eval with the reference sort-desc-take-k. Also re-eval the
    // SAME buffer to pin non-destructiveness (the window path).
    val values = Gen.listOf(Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.oneOf(Double.NaN, 0.0, -0.0, 1e308, -1e308)))
    val cases = for {
      vs <- values; k <- Gen.choose(1, 5); parts <- Gen.choose(1, 4)
    } yield (vs, k, parts)
    forAllGen(cases, n = 300) { case (vs, k, parts) =>
      val agg = graft.functions.TopKDoubles(
        org.apache.spark.sql.catalyst.expressions.Literal(1.0), k)
      val buffers = Array.fill(parts)(agg.createAggregationBuffer())
      vs.zipWithIndex.foreach { case (v, i) => // direct offer via merge of a singleton
        val single = agg.createAggregationBuffer()
        single.add(v)
        agg.merge(buffers(i % parts), agg.deserialize(agg.serialize(single)))
      }
      val merged = buffers.reduce((a, b) => agg.merge(a, agg.deserialize(agg.serialize(b))))
      def evalArr = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toDoubleArray.toSeq
      // reference: Spark's sort-desc order = java.lang.Double total order desc
      val expect = vs.sortWith((a, b) => java.lang.Double.compare(a, b) > 0).take(k)
      def key(s: Seq[Double]) = s.map(java.lang.Double.doubleToLongBits)
      assert(key(evalArr) == key(expect), s"k=$k parts=$parts vs=$vs")
      assert(key(evalArr) == key(evalArr), "eval must be repeatable (non-destructive)")
      assert(merged.size <= k, "buffer must stay bounded by k")
    }
  }
}
