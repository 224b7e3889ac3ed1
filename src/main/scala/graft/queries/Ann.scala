package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §2 #32-33).
  *
  * Outputs are (query_id, neighbor_id, rk) — ranks, not similarity values:
  * rank order is stable under the ~1e-16 cross-engine float-association
  * noise, raw sums are not. Similarities are computed in double precision
  * with a deterministic left-fold, ties broken by neighbor id.
  *
  * Scale posture: the query set is always the broadcast side; the corpus
  * side streams. knn_brute is the exact O(Q·N) baseline; knn_ivf prunes the
  * corpus to the buckets of the 2 nearest centroids (IVF nprobe=2), turning
  * the scan into O(Q·N·nprobe/nlist) — the 100 TB path, where nlist scales
  * with the corpus and centroids come from a real clustering job instead of
  * the deterministic modulo sample used here for oracle-friendliness.
  */
object Ann {

  private val K = 10
  private val NProbe = 2

  /** Fan-out of the two-level top-k ([[topK]]). 16 × K = 160 survivor rows
    * per query at the second level — negligible — while the first level's
    * per-task work shrinks 16×. */
  private val SubSplit = 16

  /** Exact per-query top-k as TWO windows instead of one: candidates are
    * salted by a deterministic hash of the neighbor id into [[SubSplit]]
    * chunks, ranked per (query, chunk), and the ≤ SubSplit·K survivors are
    * ranked again per query. Output is bit-identical to the single-window
    * form the oracles replay — the top-k of a union is contained in the
    * union of per-chunk top-ks, and both levels share the total ordering
    * (sim DESC, vec_id ASC) — but no single task ever holds a query's full
    * candidate set: a hot centroid cell (k-means happily builds lists 10²×
    * the mean) concentrated 96.7 MB / 48 s into one task at the sf10
    * stress run under the single-window shape. */
  private def topK(cands: DataFrame): DataFrame = {
    val w1 = Window.partitionBy(col("query_id"), col("__salt"))
      .orderBy(col("sim").desc, col("vec_id"))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    cands
      .withColumn("__salt", pmod(xxhash64(col("vec_id")), lit(SubSplit)))
      .withColumn("__prk", row_number().over(w1))
      .filter(col("__prk") <= K)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk").cast("long").as("rk"))
  }

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("vd"))

  /** Exact brute-force cosine top-k for the deterministic query subset
    * (vec_id % 50 == 0), self-matches excluded. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val q = v.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"))
    // spread the corpus side: the Q×N expansion is pure compute and a
    // few-split scan would run it on 1-2 tasks; no-op at production scale.
    topK(
      Tables.spread(v).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", VectorFns.cosine(col("qv"), col("vd"))))
  }

  val knnBruteSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id % 50 = 0),
       | n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
       | scored AS (
       |  SELECT q.query_id, n.vec_id,
       |         row_number() OVER (
       |           PARTITION BY q.query_id
       |           ORDER BY list_cosine_similarity(q.qv, n.vd) DESC, n.vec_id) AS rk
       |  FROM q JOIN n ON n.vec_id <> q.query_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS BIGINT) AS rk
       |FROM scored WHERE rk <= $K""".stripMargin

  /** The IVF search core shared by both centroid sources: every vector is
    * assigned to its nearest centroid (ties → lower centroid id), queries
    * probe their `nProbe` nearest centroid buckets, exact top-k inside the
    * probed buckets. Centroids are always broadcast; the corpus streams. */
  /** Top-`m` centroids per row by (cosine DESC, cent_id ASC), computed as a
    * STREAMING per-partition argmax over the broadcast centroid array —
    * never as a crossJoin-then-rank. The relational form materializes the
    * n×nlist expansion only to immediately reduce it: at the sf10 stress
    * run that was 357M rows sorted under the window, a constant 10.7 GB of
    * spill no partitioning could remove. Here each row holds an m-slot
    * insertion list in registers; FLOPs are identical, the intermediate is
    * gone. mapPartitions is justified by exactly this (SURVEY §4 preference
    * (d)): no optimizer can elide a materialized expansion, and the same
    * broadcast-loop shape already drives KMeans.fit. The cosine reproduces
    * [[graft.functions.CosineSimilarity]]'s strict left fold term by term,
    * so similarities — and therefore buckets and downstream hashes — are
    * bit-identical to the expression form. Degenerate similarities keep the
    * window's semantics too: a zero-norm vector or centroid yields NaN
    * (0/0), which Spark's `ORDER BY sim DESC` sorts FIRST (NaN is greatest
    * in its total order, while -0.0 ties +0.0 after UnsafeRow
    * normalization) — [[simGt]] mirrors exactly that. Out of contract:
    * NULL array elements (the typed encoder rejects them, where the
    * expression form skipped the element) — embeddings are dense
    * non-null vectors by schema (`containsNull=false` on write).
    *
    * Spreads its input to full parallelism first: the argmax is pure
    * compute (rows × |cents| cosine folds), and a few-split parquet scan
    * would otherwise run it on 1-2 tasks. Shared with the SemDedup cell
    * assignment ([[graft.queries.Dedup]]). */
  /** "Strictly greater" in the ordering Spark's sort uses for doubles:
    * NaN is GREATEST (so `ORDER BY sim DESC` lists it first) and ties —
    * including NaN-vs-NaN and -0.0-vs-+0.0 (UnsafeRow normalizes -0.0
    * away before any sort sees it) — are NOT greater, so the insertion
    * keeps the earlier (lower) cent_id, exactly the window's ASC
    * tiebreak. Neither primitive `>` (loses NaN entirely) nor
    * java.lang.Double.compare (splits the -0.0 tie) matches alone. */
  @inline private def simGt(a: Double, b: Double): Boolean =
    if (a != a) b == b // a is NaN: greater than anything except NaN
    else if (b != b) false // b is NaN, a is real: never greater
    else a > b // real vs real: -0.0 == 0.0, ties keep the earlier slot

  private[graft] def topCentroids(rows: DataFrame, cents: DataFrame, m: Int,
      outId: String): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    val cArr = cents.select(col("cent_id").cast("long"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val bc = s.sparkContext.broadcast(cArr)
    val out = Tables.spread(rows).as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (id, vd) =>
        // (sim desc, cent_id asc) top-m via insertion into m registers;
        // strict > on ties keeps the earlier (lower) cent_id, matching the
        // window's ORDER BY sim DESC, cent_id ASC exactly.
        val bestSim = new Array[Double](m)
        val bestId = new Array[Long](m)
        var filled = 0
        var ci = 0
        while (ci < cs.length) {
          val cv = cs(ci)._2
          // LOUD on dimension drift (a stale frozen-centroid parquet after
          // the corpus was regenerated at a new dim): a silent prefix
          // cosine would assign wrong buckets while the DuckDB twin errors
          // on mismatched list lengths — the silent-vs-loud divergence
          // class this repo refuses everywhere (r20 review finding)
          if (vd.length != cv.length)
            throw new IllegalStateException(
              s"vector dim ${vd.length} != centroid dim ${cv.length} — stale frozen " +
                "centroids for a regenerated corpus? Remove the frozen artifact " +
                "(FrozenArtifact path under the scratch root) to retrain.")
          val n = math.min(vd.length, cv.length)
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < n) {
            val xv = vd(i); val yv = cv(i)
            dot += xv * yv; na += xv * xv; nb += yv * yv
            i += 1
          }
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          var pos = filled
          while (pos > 0 && simGt(sim, bestSim(pos - 1))) pos -= 1
          if (pos < m) {
            var j = math.min(filled, m - 1)
            while (j > pos) { bestSim(j) = bestSim(j - 1); bestId(j) = bestId(j - 1); j -= 1 }
            bestSim(pos) = sim; bestId(pos) = cs(ci)._1
            if (filled < m) filled += 1
          }
          ci += 1
        }
        (0 until filled).map(r => (id, bestId(r)))
      }
    }.toDF(outId, "bucket")
    out
  }

  private def ivfSearch(v: DataFrame, cents: DataFrame, nProbe: Int, replicate: Int = 1): DataFrame = {
    // Assign each vector to its `replicate` nearest centroids (rank-1 =
    // exact IVF; rank-2 = spill lists — a vector near a list boundary lands
    // in both lists, buying recall for a bounded storage factor). IDS ONLY
    // from here to the scoring join: vectors are 1 KB rows and every
    // exchange/sort they ride through multiplies the working set — the r10
    // stress run measured 11 GB of spill from a pair-dedup that carried
    // both endpoint vectors.
    val assigned = topCentroids(v.select(col("vec_id"), col("vd")), cents, replicate, "vec_id")

    // Each query probes its nProbe nearest centroids. Queries are a bounded
    // subset (one per 50 vectors), so (query_id, qv) re-attaches later by
    // broadcast — the probe rows carry ids only.
    val q = v.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"))
    val probes = topCentroids(
      q.select(col("query_id"), col("qv")), cents, nProbe, "query_id")

    // Candidate pairs from the probed buckets only. The bucket equi-join is
    // salted UNCONDITIONALLY: k-means happily builds cells 10²× the mean,
    // and an unsalted join puts one hot cell's whole |cell|·q_b pair set in
    // a single task (measured 98.5 MB / 88 s straggler at the sf10 stress
    // run). The vector side keys by (bucket, hash(vec_id) % SubSplit); the
    // probe side is queries×nProbe rows, so replicating it ×SubSplit is
    // free. Result is identical — every (query, vector) pair still meets
    // exactly once — with per-task join work bounded by |cell|·q_b/SubSplit.
    val assignedSalted = assigned.withColumn(
      "__bsalt", pmod(xxhash64(col("vec_id")), lit(SubSplit.toLong)).cast("int"))
    val probesSalted = probes.withColumn(
      "__bsalt", explode(sequence(lit(0), lit(SubSplit - 1))))
    // With spill lists a (query, vector) pair can meet in more than one
    // probed bucket — dedupe (16-byte id pairs, hash-aggregatable — never
    // the vector-carrying rows) before scoring so top-k rows stay distinct.
    val met0 = probesSalted.join(assignedSalted, Seq("bucket", "__bsalt"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val metIds = if (replicate <= 1) met0 else met0.dropDuplicates("query_id", "vec_id")
    // Score: corpus vectors join the id pairs on vec_id (the only wide
    // exchange left — one copy of each candidate's vector), query vectors
    // re-attach by broadcast, cosine in the join projection. The top-k
    // windows downstream see (query_id, vec_id, sim) — 24-byte rows.
    val met = metIds
      .join(v, "vec_id")
      .join(broadcast(q), "query_id")
    topK(met.withColumn("sim", VectorFns.cosine(col("qv"), col("vd"))))
  }

  /** IVF-style ANN with a deterministic centroid sample (vec_id % 100 ==
    * 17) — the oracle-checkable variant: DuckDB can replay the exact same
    * centroid choice, so the approximation itself hash-matches. */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") % 100 === 17)
      .select(col("vec_id").as("cent_id"), col("vd").as("cv"))
    ivfSearch(v, cents, NProbe)
  }

  /** IVF ANN over REAL trained centroids — spherical k-means
    * ([[graft.functions.KMeans]], treeAggregate Lloyd's, no vector
    * shuffle), nlist = n/100 like the sampled variant. This is the 100 TB
    * path: trained lists are far tighter than a row sample, so the same
    * nprobe scans fewer, better buckets. Not SQL-expressible (iterative
    * float training) → rows-only driver check; AnnSpec gates recall@10
    * ≥ 0.9 vs knn_brute. */
  /** nlist sizing shared by the trained-IVF variants — see the regime
    * analysis on [[knnIvfKmeans]]. */
  private[graft] def nlistOf(n: Long): Int =
    // clamp n/25 in LONG: at ~1e11 rows (the 100 TB design point) the int
    // conversion wrapped negative and math.max floored nlist to 4 — every
    // probe became a ~25% corpus scan with no error raised
    math.max(4, math.min((4.0 * math.sqrt(n.toDouble)).toInt.toLong, n / 25).min(Int.MaxValue).toInt)

  /** nprobe sizing for the trained-IVF default path — the probe-side twin
    * of [[nlistOf]]'s two-regime clamp. On a small or weakly-clustered
    * corpus recall@k tracks the SCANNED FRACTION nprobe·replicate/nlist
    * (sf0.1 sweep, tools/RecallSweep: 7.5% → 0.82, 25% → 0.92,
    * 40% → 0.96), so the fraction gets a floor: nprobe = ⌈nlist/5⌉ ≈ 40%
    * scanned with replicate 2. On a large corpus trained lists are tight
    * and recall stops depending on the fraction (sf1: 0.67% scanned →
    * 0.988), so the CAP (32) binds instead and per-query cost keeps the
    * √n economics — at n = 10⁹, nlist ≈ 126k, 32 probes scan 0.05% of the
    * corpus. Floor 3 preserves the gate-corpus operating point. */
  private[graft] def nprobeOf(nlist: Int): Int =
    math.max(3, math.min(32, math.ceil(0.2 * nlist).toInt))

  def knnIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    // nlist ∝ √n, the standard IVF sizing: centroid assignment then costs
    // n·√n (a linear-factor-√n scan, amortizable by training on a sample)
    // instead of the n²/k a linear-in-n list count implies — the difference
    // between an index build and a disguised all-pairs pass at 100 TB.
    // Clamped by the recall regime: on a small (or weakly clustered)
    // corpus, recall@k tracks the SCANNED FRACTION nprobe·replicate/nlist,
    // so nlist must stay ≤ n/25 (≈30% scanned at the gate's n=500) — while
    // past the n=10k crossover the √n term binds and per-query cost falls
    // as the corpus grows. min of the two regimes, floor 4. nprobe scales
    // with [[nprobeOf]]. Recall@10 vs brute is gated ≥ 0.9 in AnnSpec and
    // emitted per-round in the bench JSON (ivf_recall_at10).
    val v = vecs(s, dir)
    val k = nlistOf(v.count())
    ivfSearch(v, trainCentroidsK(s, v, iters = 10, k), nprobeOf(k), replicate = 2)
  }

  /** Placeholder the static [[knnIvfKmeansSearchSql]] carries for the
    * frozen-centroid parquet location. `oracleSql` is a static map but the
    * centroids are per-CORPUS state: a bench run on another scale factor
    * must not clobber the file a pending verification will read. Verify
    * substitutes this token with [[frozenCentroidsPath]](sfDir) when it
    * dumps oracle_sql.json, so the DuckDB replay always reads the parquet
    * the same-corpus Spark run wrote. */
  private[graft] val CentroidPathToken = "__GRAFT_CENTROIDS__"

  /** Corpus-keyed location for the frozen trained centroids
    * ([[graft.core.FrozenArtifact]] holds the single path/memo
    * definition). When the `graft.centroids.dir` system property is set
    * (Verify sets it to its per-run outDir), artifacts live under a
    * dot-prefixed aux subdir of that directory — inside the run's private
    * dir so a concurrent bench (which never sets the property) can never
    * replace the parquet a pending DuckDB compare will read; the shared
    * [[graft.core.Scratch]] cache otherwise. */
  private[graft] def frozenCentroidsPath(s: SparkSession, dir: String): String =
    graft.core.FrozenArtifact.path(s, "knn_centroids", dir)

  /** Trains centroids for the trained-IVF variants (count → nlist → k-means
    * → (cent_id, cv) projection) — single definition shared by the
    * recall-gated and the oracle-checked variants so they cannot diverge. */
  private def trainCentroids(s: SparkSession, v: DataFrame, iters: Int,
      nlist: Long => Int = nlistOf): DataFrame =
    trainCentroidsK(s, v, iters, nlist(v.count()))

  /** [[trainCentroids]] with the list count already resolved — callers that
    * need `nlist` for probe sizing too ([[knnIvfKmeans]]) count once. */
  private def trainCentroidsK(s: SparkSession, v: DataFrame, iters: Int, k: Int): DataFrame =
    graft.functions.KMeans.toDf(
        s, graft.functions.KMeans.fit(v, "vec_id", "vd", k, iters = iters))
      .select(col("cent_id"), col("cv"))

  /** The driver-checkable split of the trained-IVF operator: k-means
    * training itself is iterative float work no SQL replays, but everything
    * DOWNSTREAM of the centroids is the same deterministic assignment →
    * nprobe → in-bucket top-k as `knn_ivf`. So: train, FREEZE the centroids
    * to parquet (corpus-keyed path), and search over the frozen set — the
    * oracle replays the search from the identical parquet, hash-checking
    * the whole kmeans-IVF search path (spill replication included).
    * Training quality stays gated by AnnSpec's recall@10 ≥ 0.9 on
    * `knn_ivf_kmeans`. */
  def knnIvfKmeansSearch(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    // train-once-per-JVM+corpus ([[graft.core.FrozenArtifact.ensure]]):
    // training is iterative float work (10 Lloyd rounds) NOT part of the
    // search being measured — without the memo every bench rep re-paid the
    // train inside the timed region, conflating index build with query
    // latency; reps 2..n reuse the frozen parquet, so the timed path is
    // search-only
    val path = graft.core.FrozenArtifact.ensure(
      frozenCentroidsPath(s, dir), "knn centroid train") { p =>
        trainCentroids(s, v, iters = 10)
          .coalesce(1).write.mode("overwrite").parquet(p)
        ""
      }
    val frozen = s.read.parquet(path)
    ivfSearch(v, frozen, nProbe = 3, replicate = 2)
  }

  /** DuckDB twin of the frozen-centroid IVF search: same parquet centroids,
    * same rank-≤2 spill assignment, nprobe=3, pair-dedup, in-bucket top-k. */
  val knnIvfKmeansSearchSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
       | c AS (SELECT cent_id, CAST(cv AS DOUBLE[]) AS cv FROM '$CentroidPathToken/*.parquet'),
       | assign AS (
       |  SELECT vec_id, cent_id AS bucket FROM (
       |    SELECT v.vec_id, c.cent_id,
       |           row_number() OVER (PARTITION BY v.vec_id
       |                              ORDER BY list_cosine_similarity(v.vd, c.cv) DESC, c.cent_id) AS rn
       |    FROM v CROSS JOIN c) x WHERE rn <= 2),
       | probes AS (
       |  SELECT query_id, cent_id AS bucket FROM (
       |    SELECT q.vec_id AS query_id, c.cent_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |                              ORDER BY list_cosine_similarity(q.vd, c.cv) DESC, c.cent_id) AS crk
       |    FROM v q CROSS JOIN c WHERE q.vec_id % 50 = 0) x WHERE crk <= 3),
       | met AS (
       |  SELECT DISTINCT p.query_id, a.vec_id
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.query_id),
       | scored AS (
       |  SELECT m.query_id, m.vec_id,
       |         row_number() OVER (PARTITION BY m.query_id
       |                            ORDER BY list_cosine_similarity(q.vd, n.vd) DESC, m.vec_id) AS rk
       |  FROM met m JOIN v q ON q.vec_id = m.query_id JOIN v n ON n.vec_id = m.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS BIGINT) AS rk
       |FROM scored WHERE rk <= $K""".stripMargin

  private[graft] def ivfKmeans(s: SparkSession, dir: String,
      nlistOf: Long => Int, nProbe: Int, iters: Int, replicate: Int = 1): DataFrame = {
    val v = vecs(s, dir)
    ivfSearch(v, trainCentroids(s, v, iters, nlistOf), nProbe, replicate)
  }

  /** DuckDB twin of the deterministic IVF pipeline (same centroid sample,
    * same nearest-centroid assignment, same nprobe, same in-bucket top-k) —
    * rank outputs are float-noise-immune, so the approximation itself is
    * oracle-checkable. */
  val knnIvfSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
       | c AS (SELECT vec_id AS cent_id, vd AS cv FROM v WHERE vec_id % 100 = 17),
       | assign AS (
       |  SELECT vec_id, vd, cent_id AS bucket FROM (
       |    SELECT v.vec_id, v.vd, c.cent_id,
       |           row_number() OVER (PARTITION BY v.vec_id
       |                              ORDER BY list_cosine_similarity(v.vd, c.cv) DESC, c.cent_id) AS rn
       |    FROM v CROSS JOIN c) x WHERE rn = 1),
       | probes AS (
       |  SELECT query_id, qv, cent_id AS bucket FROM (
       |    SELECT q.vec_id AS query_id, q.vd AS qv, c.cent_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |                              ORDER BY list_cosine_similarity(q.vd, c.cv) DESC, c.cent_id) AS crk
       |    FROM v q CROSS JOIN c WHERE q.vec_id % 50 = 0) x WHERE crk <= $NProbe),
       | scored AS (
       |  SELECT p.query_id, a.vec_id,
       |         row_number() OVER (PARTITION BY p.query_id
       |                            ORDER BY list_cosine_similarity(p.qv, a.vd) DESC, a.vec_id) AS rk
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.query_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS BIGINT) AS rk
       |FROM scored WHERE rk <= $K""".stripMargin

  /** Spherical inertia Σ(1 − cos(v, nearest centroid)) over the corpus,
    * computed DISTRIBUTED — broadcast centroids, per-partition argmax fold,
    * scalar sum — so the bench can evaluate training quality at any scale
    * without the full-corpus driver collect AnnSpec's small-corpus gate
    * uses. */
  private def inertia(v: DataFrame, cents: DataFrame): Double = {
    val s = v.sparkSession
    import s.implicits._
    val cArr = cents.select(col("cent_id").cast("long"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
    val bc = s.sparkContext.broadcast(cArr)
    Tables.spread(v).as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bc.value
      it.map { case (_, vd) =>
        // normalized-vector spherical objective, matching AnnSpec's gate
        val vn = math.sqrt(vd.map(e => e * e).sum)
        // zero-norm vector: cosine is undefined (every sim NaN, `> best`
        // never fires, the row would contribute 1 − (−∞) = +Inf and poison
        // the ratio — r20 review). Contribute 0 instead: applied to trained
        // and seed identically, the ratio stays meaningful.
        if (vn == 0.0) 0.0
        else {
          var best = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val cv = cs(ci)
            val n = math.min(vd.length, cv.length)
            var dot = 0.0; var nb = 0.0; var i = 0
            while (i < n) { dot += vd(i) * cv(i); nb += cv(i) * cv(i); i += 1 }
            val sim = dot / (vn * math.sqrt(nb))
            if (sim > best) best = sim
            ci += 1
          }
          1.0 - best
        }
      }
    }.toDF("d").agg(sum(col("d"))).head().getDouble(0)
  }

  /** Bench-facing quality numbers for the trained-IVF operator: recall@10
    * of [[knnIvfKmeans]] vs the exact [[knnBrute]] search, and the
    * trained/seed spherical-inertia ratio (< 1 ⇒ Lloyd iterations improved
    * the objective). `knn_ivf_kmeans` is rows-only in CORRECTNESS (float
    * training has no SQL twin), so the per-round bench artifact carries
    * the quality gate AnnSpec enforces; both searches return K per query,
    * bounded collects. */
  def qualityMetrics(s: SparkSession, dir: String): (Double, Double) = {
    import s.implicits._
    val brute = knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    // train ONCE and share between the recall search and the inertia
    // numerator — the fit is deterministic, so this is knnIvfKmeans's
    // exact search over the same centroids without paying the 10 Lloyd
    // rounds twice per bench round (r20 review finding)
    val v = vecs(s, dir)
    val k = nlistOf(v.count())
    val trained = trainCentroidsK(s, v, iters = 10, k)
    val approx = ivfSearch(v, trained, nprobeOf(k), replicate = 2)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / math.max(1, brute.size)
    val seed = graft.functions.KMeans.toDf(
        s, graft.functions.KMeans.fit(v, "vec_id", "vd", k, iters = 0))
      .select(col("cent_id"), col("cv"))
    (recall, inertia(v, trained) / inertia(v, seed))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute" -> (knnBrute _),
    "knn_ivf" -> (knnIvf _),
    "knn_ivf_kmeans" -> (knnIvfKmeans _),
    "knn_ivf_kmeans_search" -> (knnIvfKmeansSearch _)
  )

  val oracles: Map[String, String] = Map(
    "knn_brute" -> knnBruteSql,
    "knn_ivf" -> knnIvfSql,
    "knn_ivf_kmeans_search" -> knnIvfKmeansSearchSql
  )
}
