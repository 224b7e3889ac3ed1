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

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("vd"))

  /** Exact brute-force cosine top-k for the deterministic query subset
    * (vec_id % 50 == 0), self-matches excluded. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val q = v.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", VectorFns.cosine(col("qv"), col("vd")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk").cast("long").as("rk"))
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

  /** IVF-style ANN: deterministic centroid sample (vec_id % 100 == 17),
    * every vector assigned to its nearest centroid (ties → lower centroid
    * id), queries probe their NProbe nearest centroid buckets, exact top-k
    * inside the probed buckets. Rows-only check (approximation metric, no
    * SQL twin registered). */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") % 100 === 17)
      .select(col("vec_id").as("cent_id"), col("vd").as("cv"))

    // Assign each vector to its nearest centroid: broadcast the centroid set,
    // argmax via max_by with (sim, -cent_id) for a deterministic tiebreak.
    val assigned = v.crossJoin(broadcast(cents))
      .withColumn("sim", VectorFns.cosine(col("vd"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("sim"), -col("cent_id"))).as("bucket"))
      .join(v, "vec_id")

    // Each query probes its NProbe nearest centroids.
    val q = v.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"))
    val wc = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", VectorFns.cosine(col("qv"), col("cv")))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= NProbe)
      .select(col("query_id"), col("qv"), col("cent_id").as("bucket"))

    // Exact top-k inside the probed buckets only.
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    probes.join(assigned, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", VectorFns.cosine(col("qv"), col("vd")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk").cast("long").as("rk"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute" -> (knnBrute _),
    "knn_ivf" -> (knnIvf _)
  )

  val oracles: Map[String, String] = Map(
    "knn_brute" -> knnBruteSql,
    "knn_ivf" -> knnIvfSql
  )
}
