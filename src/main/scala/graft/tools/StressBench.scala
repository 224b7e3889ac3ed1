package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAccumulator}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Spill-stress validation main (BASELINE.md sf10 section): runs the heavy
  * shuffle operators at a large scale factor under a deliberately capped
  * heap (SPARK_DRIVER_MEM, default 16g via build.sbt) and reports, per
  * query, the evidence the 100 TB design claims rest on:
  *
  *   - wall seconds (single cold run — stress, not steady-state throughput)
  *   - shuffle bytes written / read (how much really crosses an exchange)
  *   - memory + disk spill bytes (did the external sorters degrade safely)
  *   - max single-task shuffle read (the skew bound: one straggler task's
  *     input must stay small relative to the heap)
  *   - task count and max task seconds
  *
  * Pass = every query completes (no OOM), wall time scales roughly with
  * data (not quadratically), and max-task input stays heap-bounded. The
  * numbers land in BASELINE.md; correctness stays gated on the driver's
  * own testdata via Verify/preverify.
  */
object StressBench {

  private final class Agg {
    val tasks = new AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val input = new AtomicLong
    val maxTaskShuffleRead = new LongAccumulator(Math.max(_, _), 0L)
    val maxTaskMs = new LongAccumulator(Math.max(_, _), 0L)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Pin UTC like Bench/Verify: NTZ→LTZ casts in Tables.normalizeTs are
      // wall-clock-identity only under a UTC session zone.
      .config("spark.sql.session.timeZone", "UTC")
      // Same declarative partition sizing as Bench: exchanges start wide and
      // AQE coalesces by map-output size, so partition count follows DATA.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
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

    @volatile var agg = new Agg
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val a = agg
          a.tasks.incrementAndGet()
          val sr = m.shuffleReadMetrics.totalBytesRead
          a.shuffleRead.addAndGet(sr)
          a.maxTaskShuffleRead.accumulate(sr)
          a.shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          a.memSpill.addAndGet(m.memoryBytesSpilled)
          a.diskSpill.addAndGet(m.diskBytesSpilled)
          a.input.addAndGet(m.inputMetrics.bytesRead)
          a.maxTaskMs.accumulate(m.executorRunTime)
        }
      }
    })

    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_clusters",
        "dedup_semantic", "dedup_simhash", "knn_ivf_kmeans_search",
        "events_interval_join", "events_sessions", "dv_sat_delta",
        "dv_sat_current", "q1_pricing", "q9_profit",
        // Key-cardinality-bound operators (not shuffle-byte-bound): global
        // prefix sums, histogram-pruned exact quantiles, the typed heap
        // aggregate through the 1M-key ObjectHashAggregate threshold, the
        // funnel's per-user ordered scan, and one real state-store
        // streaming row — the worst case here is per-task key count, which
        // the shuffle-heavy set above never stresses.
        "corpus_pack", "events_quantiles", "topk_spend_per_cust",
        "events_funnel", "events_stream_hourly")

    val rows = names.map { name =>
      agg = new Agg
      val a = agg
      val t0 = System.nanoTime()
      val err =
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          None
        } catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      val sec = (System.nanoTime() - t0) / 1e9
      // listenerBus is private[spark]; a short sleep lets the async task-end
      // events drain before the counters are read (stress runs are seconds
      // to minutes long, so 300 ms of slack is noise).
      Thread.sleep(300)
      val row =
        s"""{"q":"$name","sec":${f"$sec%.1f"},"ok":${err.isEmpty}""" +
          s""","tasks":${a.tasks.get},"input_mb":${mb(a.input.get)}""" +
          s""","shuffle_write_mb":${mb(a.shuffleWrite.get)},"shuffle_read_mb":${mb(a.shuffleRead.get)}""" +
          s""","spill_mem_mb":${mb(a.memSpill.get)},"spill_disk_mb":${mb(a.diskSpill.get)}""" +
          s""","max_task_shuffle_read_mb":${mb(a.maxTaskShuffleRead.get)},"max_task_sec":${f"${a.maxTaskMs.get / 1000.0}%.1f"}""" +
          err.map(e => s""","err":"$e"}""").getOrElse("}")
      println(s"[stress] $row")
      row
    }
    spark.stop()
    println(rows.mkString("[", ",", "]"))
  }
}
