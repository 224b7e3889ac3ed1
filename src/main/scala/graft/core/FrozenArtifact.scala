package graft.core

import org.apache.spark.sql.SparkSession

/** Corpus-keyed frozen build artifacts (IVF centroids, BPE merges): train
  * once per JVM and corpus, land to parquet, reuse across bench reps and
  * query calls — index build must never be conflated with the query
  * latency being measured.
  *
  * This is THE single definition of the pattern: the `.graft_aux`
  * dot-prefix exists because Verify sweeps its output dir's visible
  * children as query results (an aux dir sitting as a sibling of the
  * query dumps gained the r9 crash row), and a fix to the path keying or
  * the memo semantics must not have to be applied in two copies (it
  * previously lived verbatim in both Ann and TextOps). */
object FrozenArtifact {

  /** Paths this JVM already built ([[ensure]] runs each path's build once). */
  private val built = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Corpus-keyed artifact location: per-run aux dir under Verify's
    * `graft.centroids.dir` property (dot-prefixed — see class doc), the
    * shared [[Scratch]] cache otherwise (cluster-portable via
    * `spark.graft.scratch.dir`), so bench reps retrain nothing. The
    * property name is historical (centroids were the first artifact);
    * it keys every frozen artifact. */
  def path(s: SparkSession, prefix: String, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    sys.props.get("graft.centroids.dir") match {
      case Some(base) => base.stripSuffix("/") + s"/.graft_aux/${prefix}_$key"
      case None       => Scratch.stablePath(s, s"graft_${prefix}_$key")
    }
  }

  /** Build-once-per-(JVM, path): the first call runs `build(path)` — which
    * must land the artifact at `path` and may return a log-detail suffix
    * (e.g. ", 89 merges") — and logs the build seconds to stderr;
    * subsequent calls reuse the frozen artifact. Returns `path`. */
  def ensure(path: String, what: String)(build: String => String): String = {
    built.computeIfAbsent(path, _ => {
      val t0 = System.nanoTime()
      val detail = build(path)
      System.err.println(
        f"[graft] $what ${(System.nanoTime() - t0) / 1e9}%.2f s$detail -> $path")
      java.lang.Boolean.TRUE
    })
    path
  }
}
