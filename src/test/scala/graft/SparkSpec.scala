package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (cuts per-spec JVM spin-up). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
    // Explicit multi-wave exchanges (Tables.clusterBy at 4x cores = 128
    // reduce partitions) sit UNDER the 200-partition bypass-merge default,
    // so every map task streams through 128 open bucket files (4k
    // concurrent buffers at 32 tasks) — measured 3-4x the map-side CPU of
    // the serialized sort writer on dv_sat_current/dv_pit_asof at sf1
    // (scan stage 41 -> 17 s CPU). 64 keeps genuinely-narrow one-wave
    // exchanges (<= 32 buckets) on the cheap bypass path and routes
    // everything wider through the single-file sort writer.
    .config("spark.shuffle.sort.bypassMergeThreshold", "64")
    // Stall tolerance for this co-tenant host: a measured 281 s whole-JVM
    // freeze mid-suite (r21, /tmp/r21_sbt_test.log 10:11:05) blew the 120 s
    // default, the driver dropped the local executor, the heartbeater
    // exited the JVM (code 56) and the tail of the suite failed on a
    // stopped SparkContext — all 239 completed tests had passed. In
    // local mode driver and executor freeze TOGETHER, so a generous
    // timeout only tolerates host stalls; it cannot mask a real hang
    // (tests have their own outcomes).
    .config("spark.network.timeout", "600s")
    .config("spark.executor.heartbeat.maxFailures", "120")
    // The r21 driver-side failure happened DESPITE the two confs above: the
    // stall window it logged was a 54 s StateStore maintenance call (the
    // background snapshot/cleanup thread streaming suites leave armed at the
    // default 60 s cadence), stacked on a host freeze. Maintenance is a
    // pure optimization (snapshot compaction of delta files) — push it past
    // any plausible suite duration so it can never run, let alone stall,
    // mid-test. Restart correctness is unaffected: state reload just
    // replays deltas.
    .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    // Fewer heartbeat asks during a host freeze: each ask times out after
    // heartbeatInterval, and a multi-minute stall at the 10 s default burns
    // through failure budget 6x faster than at 60 s. 120 failures x 60 s
    // tolerates a 2-hour stall; still far below network.timeout semantics
    // that matter (local mode: driver and executor freeze together).
    .config("spark.executor.heartbeatInterval", "60s")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
