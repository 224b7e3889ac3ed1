package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Hash-based typed aggregates (graft_latest, graft_topk, collect_set)
      // stay in ObjectHashAggregate's map up to 1M keys per task (~a few
      // hundred MB worst case) before the sort-based fallback — the 128-key
      // default would demote every large aggregation to a sort from row 129.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // Explicit multi-wave exchanges (Tables.clusterBy at 4x cores = 128
      // reduce partitions) sit UNDER the 200-partition bypass-merge default,
      // so every map task streams through 128 open bucket files (4k
      // concurrent buffers at 32 tasks) — measured 3-4x the map-side CPU of
      // the serialized sort writer on dv_sat_current/dv_pit_asof at sf1
      // (scan stage 41 -> 17 s CPU). Bypass applies when numPartitions <=
      // threshold, so 64 keeps genuinely-narrow exchanges (up to 64
      // buckets, incl. the one-wave 32s) on the cheap bypass path and
      // routes everything wider (>64 — incl. the 128s) through the
      // single-file sort writer.
      .config("spark.shuffle.sort.bypassMergeThreshold", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Frozen-centroid parquet goes in a PER-RUN private dir: a bench run on
    // the same corpus (which uses the shared /tmp cache path) can then never
    // replace the file between this dump and the driver's DuckDB compare,
    // and retraining under a different thread count can't shift the floats
    // the oracle reads. The dir must NOT be inside outDir — the driver
    // sweeps outDir treating every subdirectory as a query result, and the
    // r9 artifact carried a permanent crash row for the centroids parquet
    // that used to land there. The oracle_sql substitution below resolves
    // against the same property, so SQL and data always agree. Routed
    // through Scratch (cluster-portable root; local JVM tmpdir by default —
    // the DuckDB compare reads this path on the driver host, so only set
    // spark.graft.scratch.dir to a location the comparing process can see).
    System.setProperty("graft.centroids.dir",
      graft.core.Scratch.tempDir(spark, "graft_verify_aux_"))
    var errors = Map.empty[String, String]
    // Optional comma-separated filter for focused local iteration (the
    // driver never sets it); oracle_sql.json is filtered to match so
    // tools/preverify.py only checks what was dumped.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(',').map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val target = new java.io.File(s"$outDir/$name")
      // A failed query must leave NO output behind — a stale result from a
      // previous run would otherwise be compared (and could pass) in its
      // place. Delete up front and again if the write dies midway.
      org.apache.commons.io.FileUtils.deleteQuietly(target)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        org.apache.commons.io.FileUtils.deleteQuietly(target)
        errors += name -> s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] FAILED $name: ${e.getMessage}")
      }
    }
    if (errors.nonEmpty) {
      // Loud summary at the end so a swallowed per-query failure can't hide
      // in the scrollback (round-1 lesson: events_* failed silently).
      System.err.println(s"[verify] ${errors.size} QUERIES FAILED: ${errors.keys.toSeq.sorted.mkString(", ")}")
    }
    def q(s: String): String = graft.core.Json.str(s)
    // oracleSql is static, but the frozen-centroid oracle must read the
    // parquet THIS corpus's Spark run wrote — substitute the corpus-keyed
    // path at dump time so a bench on another scale factor can't clobber
    // the file between this dump and the DuckDB compare.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) =>
        val sql = v.replace(
          graft.queries.Ann.CentroidPathToken,
          graft.queries.Ann.frozenCentroidsPath(spark, sfDir))
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
