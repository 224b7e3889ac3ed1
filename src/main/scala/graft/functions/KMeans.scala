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

  /** FAISS-style training-sample bound, points per centroid: Lloyd's cost
    * is |train| × k × dim × iters, so training on the FULL corpus makes the
    * index build a disguised n·√n scan of everything (at 100 TB: several
    * passes over every vector). A bounded per-centroid sample (FAISS
    * recommends 39-256 training points per centroid; 64 sits inside that
    * band) caps the iteration cost at k²·64·dim·iters — a function of the
    * INDEX size, not the corpus — while the centroid quality loss is
    * statistical noise. Corpora with n ≤ 64·k train on everything, so
    * test-scale runs (and their recall gates) are bit-identical. */
  val TrainPointsPerCentroid = 64L

  /** Train `k` unit-norm centroids over `(idCol: long, vecCol: array<double>)`
    * rows; returns cent_id → centroid, cent_id in [0, k). */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 5): Array[Array[Double]] = {
    // k=0 otherwise dies with a bare division-by-zero deep in seeding and
    // k<0 with NoSuchElementException at centroids.head — name the real error
    require(k >= 1, s"k-means needs k >= 1, got $k")
    // iters = 0 is meaningful: return the deterministic SEED centroids
    // (AnnSpec's inertia baseline uses exactly this)
    require(iters >= 0, s"k-means needs iters >= 0, got $iters")
    val spark = vecs.sparkSession
    import spark.implicits._
    // Cache the bounded TRAINING SAMPLE (below), never the full corpus —
    // Dataset.cache() of all vectors is exactly the kind of thing that
    // works at sf0.1 and detonates at 100 TB. The corpus is touched in a
    // fixed small number of passes, each as narrow as the work allows:
    // count + seed ranks read ONLY the pruned id column (no vector decode,
    // no normalize), the seed pull filters by id BEFORE any per-row work
    // (the predicate reaches the scan), and the sample build is the one
    // full-width pass.
    val ids = vecs.select(col(idCol).cast("long").as("__id")).as[Long]
    var train: org.apache.spark.sql.Dataset[(Long, Array[Double])] = null
    try {
      val n = ids.count()
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
      val seedIds = ids.rdd.sortBy(identity)
        .zipWithIndex()
        .filter { case (_, r) => r % stride == 0 && r < stride * k }
        .map(_._1).collect().toSet
      // Ids are not REQUIRED to be unique by this contract: a duplicated id
      // would pull every row sharing it and seed >k centroids (changing kk
      // and the trained index shape). Keep exactly one deterministic row
      // per seed id — the lexicographically smallest normalized vector
      // (the tiebreak compares normalized vectors, same as before: it is
      // the centroid SET that must be deterministic).
      //
      // The filter is a Column predicate (isInCollection over the k seed
      // ids), NOT a typed lambda: Catalyst can't see through a TypedFilter,
      // which would deserialize/decode every vector — a second full-width
      // corpus pass. As an In/InSet on the id column it runs before vector
      // decode and reaches the parquet scan for row-group stats pruning.
      var centroids = vecs
        .select(col(idCol).cast("long").as("__id"), col(vecCol))
        .where(col("__id").isInCollection(seedIds))
        .as[(Long, Array[Double])]
        .map { case (id, v) => (id, normalize(v)) }
        .rdd
        .reduceByKey((a, b) => if (lexLte(a, b)) a else b)
        .collect().sortBy(_._1).map(_._2)

      // Bounded deterministic training sample: keep a row iff a splitmix64
      // mix of its id falls under the sample fraction — a pure function of
      // the id (reproducible, no RNG state, no collect of sampled ids), a
      // single streaming filter over the corpus, and uniform regardless of
      // id distribution. Binds only when n > 64·k (see
      // [[TrainPointsPerCentroid]]); below the cap the whole corpus is the
      // sample (one normalize pass, cached, then iterated).
      val cap = TrainPointsPerCentroid * k
      val frac = if (n <= cap) 1.1 else cap.toDouble / n
      train = vecs.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Double])]
        .filter { case (id, _) => frac >= 1.0 || (mix64(id) >>> 11) * Inv53 < frac }
        .map { case (id, v) => (id, normalize(v)) }
      train.cache()

      val sc = spark.sparkContext
      var it = 0
      while (it < iters) {
        val bc = sc.broadcast(centroids)
        val dim = centroids.head.length
        val kk = centroids.length
        // (per-cluster vector sums, per-cluster counts) — combined on the
        // driver via treeAggregate, nothing shuffles.
        val (sums, counts) = train.rdd.treeAggregate((Array.fill(kk)(new Array[Double](dim)), new Array[Long](kk)))(
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
    } finally { if (train != null) { train.unpersist(); () } }
  }

  private val Inv53 = 1.0 / (1L << 53)

  /** splitmix64 finalizer — uniform 64-bit mix of the id for the
    * deterministic training sample. */
  private def mix64(id: Long): Long = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
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
