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

  /** Paths this JVM already built ([[ensure]] runs each path's build once);
    * values are per-path build records so the multi-second Spark build runs
    * OUTSIDE the map's bin locks (executing arbitrary work inside
    * computeIfAbsent violates the CHM mapping-function contract and would
    * deadlock the moment one artifact's build ensures another —
    * r20 review finding). The record carries the build OUTCOME, not just
    * completion: a waiter released by a FAILED build must not return
    * `path` as if the artifact existed (it would read a missing or
    * half-written artifact with the original error lost) — it loops back
    * into the map and becomes the retrying builder itself. */
  private final class Build {
    val latch = new java.util.concurrent.CountDownLatch(1)
    @volatile var failed: Boolean = false
  }
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Build]()

  /** Corpus-dir → artifact key. The sanitized spelling alone can collide
    * two distinct corpora ('/data/my corpus' vs '/data/my_corpus' — r20
    * review finding), and a collision under the cross-JVM reuse contract
    * would serve one corpus the OTHER's frozen artifact forever; a short
    * digest of the RAW path makes keys injective while the sanitized
    * prefix keeps them human-readable. */
  private def keyOf(dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + digest
  }

  /** Corpus-keyed artifact location: per-run aux dir under Verify's
    * `graft.centroids.dir` property (dot-prefixed — see class doc), the
    * shared [[Scratch]] cache otherwise (cluster-portable via
    * `spark.graft.scratch.dir`), so bench reps retrain nothing. The
    * property name is historical (centroids were the first artifact).
    * The per-run diversion exists for artifacts the ORACLE side reads
    * (Verify's separate-process DuckDB compare replays the centroid
    * assignment from the run's own files); artifacts with no oracle
    * consumer should use [[sharedPath]]. */
  def path(s: SparkSession, prefix: String, dir: String): String =
    sys.props.get("graft.centroids.dir") match {
      case Some(base) => base.stripSuffix("/") + s"/.graft_aux/${prefix}_${keyOf(dir)}"
      case None       => sharedPath(s, prefix, dir)
    }

  /** The cross-JVM shared location, IGNORING the per-run diversion — for
    * artifacts nothing outside the engine reads (BPE merges): a Verify
    * run re-paying the whole corpus-scan train into a never-seen-again
    * aux dir bought nothing (r20 review finding). */
  def sharedPath(s: SparkSession, prefix: String, dir: String): String =
    Scratch.stablePath(s, s"graft_${prefix}_${keyOf(dir)}")

  /** Build-once-per-(JVM, path): the first call runs `build(path)` — which
    * must land the artifact at `path` and may return a log-detail suffix
    * (e.g. ", 89 merges") — and logs the build seconds to stderr;
    * subsequent calls reuse the frozen artifact (waiting on the first
    * call's latch if the build is still in flight). A FAILED build clears
    * its latch entry so a later call can retry instead of reusing a
    * half-built artifact; waiters released by that failure retry the
    * build themselves instead of returning a path that was never landed.
    * Returns `path`. */
  @scala.annotation.tailrec
  def ensure(path: String, what: String)(build: String => String): String = {
    val mine = new Build
    val prior = built.putIfAbsent(path, mine)
    if (prior != null) {
      prior.latch.await()
      // the failing builder removes its entry BEFORE countDown, so the
      // recursive attempt never re-waits on the same failed record
      if (!prior.failed) path
      else ensure(path, what)(build)
    } else {
      var ok = false
      try {
        val t0 = System.nanoTime()
        val detail = build(path)
        System.err.println(
          f"[graft] $what ${(System.nanoTime() - t0) / 1e9}%.2f s$detail -> $path")
        ok = true
        path
      } finally {
        if (!ok) { mine.failed = true; built.remove(path, mine) }
        mine.latch.countDown()
      }
    }
  }
}
