package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Pins the rank-band SemDedup core ([[Dedup.semanticKeepers]]): the in-cell
  * comparison is |cell|·depth (linear), never the all-pairs |cell|² the naive
  * shape degrades to on a boilerplate corpus where one semantic cell swallows
  * everything.
  */
class DedupSemanticSpec extends SparkSpec {

  private def vecsDf(rows: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "vd")
  }

  private def centsDf(rows: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("cent_id", "cv")
  }

  test("adversarial single dense cell: linear band join, exact windowed keepers") {
    // 20k identical vectors, one centroid: the pre-r9 all-pairs shape emits
    // 200M candidate pairs here; the band join emits 20k·depth ≈ 640k. With
    // identical vectors every in-window cosine is 1, so the keeper of the
    // vector at rank r is exactly the id at rank max(0, r - depth) — assert
    // the whole output analytically.
    val n = 20000
    val depth = 32
    // Non-contiguous, shuffled-ish ids so rank order != insertion order.
    val ids = (0 until n).map(i => ((i.toLong * 7919L) % 100003L) * 10L + 3L)
    val v = Array.fill(8)(0.25)
    val out = Dedup
      .semanticKeepers(vecsDf(ids.map(_ -> v)), centsDf(Seq(1L -> v)), depth)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val sorted = ids.sorted
    assert(out.size == n - 1)
    sorted.zipWithIndex.drop(1).foreach { case (id, r) =>
      assert(out(id) == sorted(math.max(0, r - depth)), s"id=$id rank=$r")
    }
  }

  test("depth >= cell size makes the window exact: matches all-pairs brute force") {
    // 3 well-separated clusters of 60, plus per-vector noise keeping most
    // in-cluster cosines above 0.95 and some below — exercises both the
    // threshold and the min-keeper reduction against a brute-force twin.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(3)(Array.fill(dim)(rnd.nextDouble() + 0.1))
    val rows = (0 until 180).map { i =>
      val c = centers(i % 3)
      val noise = 0.02 * (i % 7)
      (i.toLong * 3L + 1L, c.zipWithIndex.map { case (x, d) =>
        x * (1.0 + noise * (if (d % 2 == 0) 1 else -1))
      })
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < a.length) { dot += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d); d += 1 }
      dot / math.sqrt(na * nb)
    }
    // Brute-force twin: assign to nearest centroid (ties toward lower id,
    // as max_by(struct(sim, -cent_id)) does), then all-pairs in cell.
    val cents = Seq(5L -> centers(0), 11L -> centers(1), 23L -> centers(2))
    def cell(v: Array[Double]): Long =
      cents.maxBy { case (id, cv) => (cos(v, cv), -id) }._1
    val expected = rows
      .groupBy { case (_, v) => cell(v) }
      .values
      .flatMap { members =>
        members.flatMap { case (bId, bv) =>
          val ks = members.collect {
            case (aId, av) if aId < bId && cos(av, bv) >= 0.95 => aId
          }
          if (ks.isEmpty) None else Some(bId -> ks.min)
        }
      }
      .toMap
    val got = Dedup
      .semanticKeepers(vecsDf(rows), centsDf(cents), depth = 256)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == expected)
  }

  test("band join plans as an equi join on (cell, blk), not a cartesian pair pass") {
    val v = vecsDf((0L until 50L).map(_ -> Array.fill(4)(0.5)))
    val c = centsDf(Seq(1L -> Array.fill(4)(0.5)))
    val p = Dedup.semanticKeepers(v, c, 16).queryExecution.executedPlan.toString
    // Nested-loop joins only for the broadcast centroid assignment (the
    // `ranked` subtree is referenced by both sides, so pre-AQE it prints
    // twice); the pair stage itself must be an equi join keyed on
    // (cell, blk) — never a cartesian pair pass.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert("(?s)Join \\[cell#\\d+L?, blk#\\d+L?\\]".r.findFirstIn(p).isDefined, p)
  }
}
