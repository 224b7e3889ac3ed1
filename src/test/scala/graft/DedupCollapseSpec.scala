package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.Dedup

/** Pins the adaptive exact-dup collapse ([[Dedup.collapseWorthwhile]]): the
  * collapsed and uncollapsed minhash/simhash/clusters pipelines must be
  * BIT-IDENTICAL on any corpus, so the branch may be chosen on cost alone —
  * collapse on dup-heavy corpora (the ×10-replicated sf10 stress shape),
  * single-pass on dup-light ones (the sf0.1 regression r10 recovers).
  */
class DedupCollapseSpec extends SparkSpec {

  /** Deterministic dup-heavy corpus: ~30 distinct texts (some near-dup
    * pairs differing by one word, one short non-live text), replicated into
    * groups of size 1/2/5/10 under distinct non-contiguous ids. */
  private lazy val dupHeavyDocs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    def sentence(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = Vector.tabulate(12)(_ => sentence(12 + rnd.nextInt(8)))
    // Near-dup partners: swap one word so Jaccard stays high but < 1.
    val nears = bases.take(5).map(t => t.replaceFirst("\\w+", "zulu"))
    // One short text (< 3 words): live-group predicate must exclude it.
    val texts = (bases ++ nears :+ "two words").zipWithIndex
    texts.flatMap { case (t, i) =>
      val copies = i % 4 match {
        case 0 => 10
        case 1 => 5
        case 2 => 2
        case 3 => 1
      }
      (0 until copies).map(c => ((i.toLong * 1000 + c * 7 + 3), t))
    }
  }

  private def dnOf(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.norm(col("text")).as("norm"))
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def hamPairsOf(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("collapseWorthwhile: true on dup-heavy, false on dup-free") {
    assert(Dedup.collapseWorthwhile(dnOf(dupHeavyDocs), "spec-heavy"))
    val distinct = dupHeavyDocs.zipWithIndex
      .map { case ((id, t), i) => (id, s"$t unique$i") }
    assert(!Dedup.collapseWorthwhile(dnOf(distinct), "spec-light"))
  }

  test("minhash: collapsed branch is bit-identical to the plain branch") {
    val dn = dnOf(dupHeavyDocs)
    val plain = pairsOf(Dedup.minhashPlain(spark, dn))
    val collapsed = pairsOf(Dedup.minhashExpand(Dedup.minhashCollapsed(spark, dn)))
    assert(plain.nonEmpty, "corpus must produce near-dup pairs")
    // Must contain cross-group near-dup pairs, not just within-group ones,
    // or the expansion's cross path is untested.
    assert(plain.exists(p => p._3 < 1.0), "need cross-group pairs with jaccard < 1")
    assert(collapsed == plain)
  }

  test("simhash: collapsed branch is bit-identical to the plain branch") {
    import spark.implicits._
    val dir = tmpDir("graft_collapse_")
    dupHeavyDocs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val sigs = Dedup.simhashSigs(spark, dir)
    val plain = hamPairsOf(Dedup.simhashPlain(sigs))
    val collapsed = hamPairsOf(Dedup.simhashCollapsed(sigs))
    assert(plain.nonEmpty)
    assert(collapsed == plain)
  }

  test("clusters: rep-level CC + expansion matches union-find over plain pairs") {
    val dn = dnOf(dupHeavyDocs)
    // Expected: union-find over the member-level pair graph the plain
    // pipeline emits — an independent implementation of the semantics.
    val pairs = Dedup.minhashPlain(spark, dn)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => (n, find(n))).toSet
    val got = Dedup.clustersCollapsed(spark, dn).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }
}
