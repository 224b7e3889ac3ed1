package graft

import graft.functions.Bpe

/** Pins the real-BPE tokenizer (SURVEY §2 #36a): training merge order on
  * the classic Sennrich fixture, greedy lowest-rank encoding on
  * hand-computed words, determinism, and the distributed `text_tokens_bpe`
  * pass against a driver-side re-encode (the operator is rows-only under
  * the driver — the merge loop has no SQL twin — so THIS spec is its
  * correctness gate). */
class BpeSpec extends SparkSpec {

  test("pre-tokenizer matches the BpeishPattern segmentation") {
    assert(Bpe.preTokens("Hello, world 42!") == List("Hello", ",", "world", "42", "!"))
    assert(Bpe.preTokens("a1b") == List("a", "1", "b"))
    assert(Bpe.preTokens("  \t\n") == Nil)
    assert(Bpe.preTokens("") == Nil)
    // non-ASCII letters are single symbols (the regex's third class)
    assert(Bpe.preTokens("héllo") == List("h", "é", "llo"))
  }

  test("supplementary characters: one code point = one pre-token = one base symbol (regex parity)") {
    // java.util.regex's negated char class matches a full CODE POINT, so an
    // emoji is ONE pre-token — a UTF-16 char walk would emit two lone
    // surrogate halves and double-count astral text (r19 review finding)
    val emoji = new String(Character.toChars(0x1F600)) // 😀, 2 UTF-16 chars
    val cjkB = new String(Character.toChars(0x20000))  // 𠀀, CJK ext B
    val s = s"a${emoji}b $cjkB$emoji 7"
    // parity oracle: the actual regex the operator's column uses
    val p = java.util.regex.Pattern.compile(graft.functions.TextFns.BpeishPattern)
    val m = p.matcher(s)
    val viaRegex = Iterator.continually(m.find()).takeWhile(identity).map(_ => m.group()).toList
    assert(Bpe.preTokens(s) == viaRegex, s"hand-rolled walk diverged from the regex on $s")
    assert(viaRegex == List("a", emoji, "b", cjkB, emoji, "7"))
    // base symbols are code points too: an untrained astral char is ONE
    // token, and training over astral words never sees surrogate halves
    assert(Bpe.encodeCount(emoji, Map.empty) == 1)
    val merges = Bpe.train(Seq(s"$emoji$emoji" -> 5L), numMerges = 2, minPairFreq = 2L)
    assert(merges.toSeq == Seq(emoji -> emoji), merges.mkString(","))
    assert(Bpe.encodeCount(emoji + emoji, Bpe.ranksOf(merges)) == 1)
    val cache = new java.util.HashMap[String, Integer]()
    assert(Bpe.countTokens(s, Map.empty, cache) == 6L)
  }

  test("training follows weighted pair frequency with deterministic lexicographic tiebreak") {
    // the classic BPE fixture (Sennrich et al. 2016 §3.2, sans </w>):
    // pair counts: (e,s)=9, then (es,t)=9, then (l,o)=7, (lo,w)=7
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(dict, numMerges = 4)
    assert(merges.toSeq == Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    // 5th merge: count-6 tie among (n,e), (e,w), (w,est) → smallest pair
    val m5 = Bpe.train(dict, numMerges = 5)
    assert(m5(4) == ("e" -> "w"), m5.mkString(", "))
    // input order must not matter
    assert(Bpe.train(dict.reverse, numMerges = 5).toSeq == m5.toSeq)
    // early stop at the min-pair-frequency floor, not numMerges
    val tiny = Bpe.train(Seq("ab" -> 1L), numMerges = 10)
    assert(tiny.isEmpty, s"freq-1 pair must not merge: ${tiny.mkString(",")}")
  }

  test("greedy lowest-rank encode on hand-computed words") {
    val ranks = Bpe.ranksOf(Array("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    // lowest → l|o|w|e|s|t → es → est → lo → low → [low, est]
    assert(Bpe.encodeCount("lowest", ranks) == 2)
    assert(Bpe.encodeCount("low", ranks) == 1)
    assert(Bpe.encodeCount("newest", ranks) == 4) // n|e|w|est
    assert(Bpe.encodeCount("xyz", ranks) == 3)    // nothing merges
    assert(Bpe.encodeCount("", ranks) == 0)
    assert(Bpe.encodeCount("q", ranks) == 1)
    // no merges at all: every char its own token (no UNK)
    assert(Bpe.encodeCount("anything", Map.empty) == 8)
    // rank order matters: with (e,s) ranked below (s,t), "est" → e|st
    val r2 = Bpe.ranksOf(Array("s" -> "t", "e" -> "s"))
    assert(Bpe.encodeCount("est", r2) == 2)
  }

  test("countTokens sums pre-token encodes and the word cache is transparent") {
    val ranks = Bpe.ranksOf(Array("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    val cache = new java.util.HashMap[String, Integer]()
    val text = "lowest low, lowest!"
    // lowest(2) + low(1) + ,(1) + lowest(2) + !(1)
    assert(Bpe.countTokens(text, ranks, cache) == 7L)
    assert(cache.containsKey("lowest"))
    // cached second pass: identical
    assert(Bpe.countTokens(text, ranks, cache) == 7L)
  }

  test("text_tokens_bpe: distributed pass equals a driver-side re-encode; counts bounded by pre-token counts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.TextOps.textTokensBpe(spark, dir)
      .as[(Long, Long)].collect().toMap
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(out.size == docs.length && docs.nonEmpty)

    // re-encode on the driver from the SAME frozen merges
    val path = graft.queries.TextOps.frozenMergesPath(spark, dir)
    val merges = spark.read.parquet(path).orderBy("rank")
      .select("left", "right").as[(String, String)].collect()
    assert(merges.nonEmpty, "training produced no merges")
    val ranks = Bpe.ranksOf(merges)
    val cache = new java.util.HashMap[String, Integer]()
    docs.foreach { case (id, text) =>
      val expect = Bpe.countTokens(text, ranks, cache)
      assert(out(id) == expect, s"doc $id: got ${out(id)}, want $expect")
      // real-token invariants: merges only shrink, chars only bound above
      val pre = Bpe.preTokens(text)
      assert(out(id) <= pre.map(_.length).sum && out(id) >= pre.length,
        s"doc $id count ${out(id)} outside [${pre.length}, ${pre.map(_.length).sum}]")
    }
    // the frozen table makes reruns deterministic
    val again = graft.queries.TextOps.textTokensBpe(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(again == out)
    // and the real count is meaningfully below the regex approximation's
    // char mass: on natural language most words merge to few tokens
    val totalTokens = out.values.sum.toDouble
    val totalChars = docs.map(_._2.length.toLong).sum.toDouble
    assert(totalTokens < totalChars / 2.0,
      f"BPE barely compressed: $totalTokens%.0f tokens over $totalChars%.0f chars")

    // r19 verdict #4a: the frozen artifact carries its train stats — at the
    // default 32k cap this corpus's full vocabulary fits, so the recorded
    // dropped mass must be exactly zero (the error bar is honest both ways)
    val stats = graft.queries.TextOps.bpeTrainStats(spark, dir)
    assert(stats.isDefined, "no _train_stats.json beside the frozen merges")
    assert(stats.get.contains("\"dropped_mass_frac\":0.0"), stats.get)
  }

  test("dict cap truncation is recorded: dropped-mass fraction > 0 under a tiny cap") {
    val dir = "/root/testdata/sf0.001"
    val conf = spark.conf
    try {
      // fresh artifact path via the version knob — the JVM memo and the
      // on-disk cache both key by path, so version bumps force a retrain
      conf.set(graft.core.Confs.BpeMergesVersionKey, "901")
      conf.set(graft.core.Confs.BpeDictCapKey, "5")
      conf.set(graft.core.Confs.BpeNumMergesKey, "8")
      graft.queries.TextOps.textTokensBpe(spark, dir).collect()
      val stats = graft.queries.TextOps.bpeTrainStats(spark, dir).get
      assert(stats.contains("\"dict_cap\":5") && stats.contains("\"dict_types\":5"), stats)
      val dropped = """"dropped_mass_frac":([0-9.eE-]+)""".r
        .findFirstMatchIn(stats).get.group(1).toDouble
      assert(dropped > 0.0 && dropped < 1.0, s"dropped=$dropped in $stats")
      val kept = """"kept_mass":(\d+)""".r.findFirstMatchIn(stats).get.group(1).toLong
      val total = """"total_pretokens":(\d+)""".r.findFirstMatchIn(stats).get.group(1).toLong
      assert(kept < total && math.abs((1.0 - kept.toDouble / total) - dropped) < 1e-12)
    } finally {
      conf.unset(graft.core.Confs.BpeMergesVersionKey)
      conf.unset(graft.core.Confs.BpeDictCapKey)
      conf.unset(graft.core.Confs.BpeNumMergesKey)
    }
  }

  test("merges version knob is the explicit retrain path: new version, new artifact") {
    val dir = "/root/testdata/sf0.001"
    val conf = spark.conf
    val v1Path = graft.queries.TextOps.frozenMergesPath(spark, dir)
    try {
      conf.set(graft.core.Confs.BpeMergesVersionKey, "902")
      conf.set(graft.core.Confs.BpeNumMergesKey, "3")
      val v902Path = graft.queries.TextOps.frozenMergesPath(spark, dir)
      assert(v902Path != v1Path, "version bump did not change the artifact path")
      graft.queries.TextOps.textTokensBpe(spark, dir).collect()
      // retrained under the new caps, not a reuse of the v1 artifact
      val merges = spark.read.parquet(v902Path).count()
      assert(merges == 3L, s"expected a fresh 3-merge train, got $merges")
    } finally {
      conf.unset(graft.core.Confs.BpeMergesVersionKey)
      conf.unset(graft.core.Confs.BpeNumMergesKey)
    }
  }
}
