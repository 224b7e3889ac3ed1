package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cluster-portable scratch locations for intermediate landings (connected-
  * components label parquet, frozen IVF centroids, Verify's aux dir).
  *
  * Driver-local `Files.createTempDirectory` / literal `"/tmp/..."` paths
  * work under local[n] but break the moment the code runs distributed:
  * executors and the driver no longer share a filesystem, so a Spark write
  * to a driver-local path scatters part files across machines and the
  * read-back sees nothing. Every scratch landing therefore resolves
  * against ONE configurable root:
  *
  *   - `spark.graft.scratch.dir` (session conf), when set — any
  *     Hadoop-resolvable URI (`hdfs://...`, `s3a://...`, `file:///...`).
  *     On a cluster this must point at shared storage.
  *   - otherwise the JVM temp dir (`java.io.tmpdir`, normally `/tmp`) —
  *     exactly the previous local-mode behavior, so default paths (and the
  *     oracle hashes that read them) are unchanged.
  *
  * All path handling goes through the Hadoop FS API so a non-local scheme
  * works end to end (creation, exists-checks, JVM-exit cleanup).
  */
object Scratch {
  val ConfKey = "spark.graft.scratch.dir"

  /** The scratch root: `spark.graft.scratch.dir` if set, else the local JVM
    * temp dir. No trailing slash. */
  def root(spark: SparkSession): String =
    spark.conf.getOption(ConfKey)
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      .stripSuffix("/")

  /** A fresh unique directory path under the root, registered for JVM-exit
    * deletion via the Hadoop FS API (scheme-agnostic — works for HDFS/S3A
    * roots, unlike `FileUtils.forceDeleteOnExit`). The directory is NOT
    * created here: Spark writers create their target themselves, and a
    * pre-created dir would trip `mode("error")` writers. */
  def tempDir(spark: SparkSession, prefix: String): String = {
    val p = new Path(root(spark), prefix + java.util.UUID.randomUUID().toString.replace("-", ""))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.deleteOnExit(p)
    p.toString
  }

  /** A STABLE (deliberately reusable across calls and JVMs) path under the
    * root, for cross-run caches keyed by `name` — e.g. the frozen IVF
    * centroids keyed by corpus dir. Not scheduled for deletion. */
  def stablePath(spark: SparkSession, name: String): String =
    new Path(root(spark), name).toString

  /** Scratch root for EPHEMERAL streaming replays (the oracle/bench lakes
    * that stage a finite file stream, run one AvailableNow pass, and are
    * reaped at JVM exit). Structured Streaming fsyncs its checkpoint
    * (offset log, commit log, state store snapshots) once per micro-batch
    * per partition — on this container's disk that I/O held
    * events_stream_join at a ~7 s floor that RAM backing removes (r11
    * verdict ask; measurements in BASELINE.md). Resolution: the
    * [[ConfKey]] override wins as usual; else `/dev/shm` when present and
    * writable (Linux tmpfs); else the JVM tmpdir. NOT for production
    * streams — a durable checkpoint on shared storage is what makes a
    * real stream recoverable, and the StreamingDv sinks take that path
    * explicitly from the caller. */
  def streamRoot(spark: SparkSession): String =
    spark.conf.getOption(ConfKey).getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else sys.props.getOrElse("java.io.tmpdir", "/tmp")
    }.stripSuffix("/")

  /** [[tempDir]] against [[streamRoot]]. */
  def streamTempDir(spark: SparkSession, prefix: String): String = {
    val p = new Path(streamRoot(spark), prefix + java.util.UUID.randomUUID().toString.replace("-", ""))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.deleteOnExit(p)
    p.toString
  }
}
