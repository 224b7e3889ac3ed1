package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed spherical k-means (Lloyd's) for IVF centroid training.
  *
  * The scale shape is the one MLlib's KMeans uses: centroids live on the
  * driver (k × dim doubles — tiny), each iteration broadcasts them and
  * accumulates per-cluster (sum, count) with `treeAggregate`, so the only
  * cross-executor traffic per iteration is one k×dim partial per partition
  * — no shuffle of the vectors themselves, ever. 100 TB of vectors with
  * k=65k IVF lists is a few GB of partials; the vectors stream.
  *
  * Determinism: seeding is a fixed every-(n/k)-th-row-by-id sample, so the
  * starting point is reproducible; float accumulation order inside
  * treeAggregate is not guaranteed, which can move a boundary vector
  * between clusters run-to-run — callers gate on recall (a set metric),
  * not on exact assignment.
  */
object KMeans {

  /** Train `k` unit-norm centroids over `(idCol: long, vecCol: array<double>)`
    * rows; returns cent_id → centroid, cent_id in [0, k). */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 5): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val data = vecs.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Double])]
      .map { case (id, v) => (id, normalize(v)) }
    data.cache()
    try {
      val n = data.count()
      require(n >= k, s"k=$k exceeds $n vectors")
      // Deterministic seeds: every (n/k)-th vector in id order. The rank is
      // computed DISTRIBUTED — sortBy + zipWithIndex over the 8-byte ids
      // only (range-partitioned sort, per-partition offsets; no vectors
      // move) — never via a global row_number window, which funnels every
      // (id, vector) row into ONE task: measured as a 98.5 MB / 60 s
      // straggler at the sf10 stress run. Selected ids then pull their
      // vectors back with a broadcast-semi filter. Same ids, same order,
      // bit-identical seed set.
      val stride = math.max(1L, n / k)
      val seedIds = data.rdd.map(_._1).sortBy(identity)
        .zipWithIndex()
        .filter { case (_, r) => r % stride == 0 && r < stride * k }
        .map(_._1).collect().toSet
      // Ids are not REQUIRED to be unique by this contract: a duplicated id
      // would pull every row sharing it and seed >k centroids (changing kk
      // and the trained index shape). Keep exactly one deterministic row
      // per seed id — the lexicographically smallest vector.
      var centroids = data.rdd
        .filter { case (id, _) => seedIds.contains(id) }
        .reduceByKey((a, b) => if (lexLte(a, b)) a else b)
        .collect().sortBy(_._1).map(_._2)

      val sc = spark.sparkContext
      var it = 0
      while (it < iters) {
        val bc = sc.broadcast(centroids)
        val dim = centroids.head.length
        val kk = centroids.length
        // (per-cluster vector sums, per-cluster counts) — combined on the
        // driver via treeAggregate, nothing shuffles.
        val (sums, counts) = data.rdd.treeAggregate((Array.fill(kk)(new Array[Double](dim)), new Array[Long](kk)))(
          seqOp = { case ((s, c), (_, v)) =>
            val b = nearest(bc.value, v)
            val tgt = s(b); var i = 0
            while (i < dim) { tgt(i) += v(i); i += 1 }
            c(b) += 1L
            (s, c)
          },
          combOp = { case ((s1, c1), (s2, c2)) =>
            var j = 0
            while (j < kk) {
              val a = s1(j); val b = s2(j); var i = 0
              while (i < dim) { a(i) += b(i); i += 1 }
              c1(j) += c2(j)
              j += 1
            }
            (s1, c1)
          })
        bc.destroy()
        centroids = Array.tabulate(kk) { j =>
          if (counts(j) == 0L) centroids(j) // empty cluster keeps its seed
          else normalize(sums(j).map(_ / counts(j)))
        }
        it += 1
      }
      centroids
    } finally data.unpersist()
  }

  /** Index of the max-dot-product centroid (unit vectors ⇒ cosine argmax). */
  def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < cents.length) {
      val c = cents(j); var d = 0.0; var i = 0
      while (i < c.length) { d += c(i) * v(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = j }
      j += 1
    }
    best
  }

  /** Total lexicographic order on vectors (java.lang.Double.compare per
    * element, shorter prefix first) — the deterministic tie-break for
    * duplicate seed ids. */
  private def lexLte(a: Array[Double], b: Array[Double]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Double.compare(a(i), b(i))
      if (c != 0) return c < 0
      i += 1
    }
    a.length <= b.length
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm == 0.0) v else v.map(_ / nrm)
  }

  /** Centroids as a (cent_id int, cv array<double>) DataFrame for joining. */
  def toDf(spark: org.apache.spark.sql.SparkSession, cents: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = cents.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(Seq(
        StructField("cent_id", IntegerType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false))))
  }
}
