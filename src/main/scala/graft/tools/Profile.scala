package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main for bench outlier analysis (not part of the
  * library surface; driven manually while tuning). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    // Mirror Bench's AQE exchange sizing when asked, to reproduce bench
    // behavior exactly (SPARK_GRAFT_INIT_PARTS=512 etc.).
    sys.env.get("SPARK_GRAFT_INIT_PARTS").foreach { n =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n)
    }
    val spark = builder.getOrCreate()
    // Same conf sweep hook as Bench: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k.trim, v.trim)
        case _ => System.err.println(s"[prof] ignoring malformed SPARK_GRAFT_EXTRA_CONF token '$kv' (want k=v)")
      }
    })
    spark.sparkContext.setLogLevel("WARN")
    // Micro-batch cost decomposition (PROF_STREAM=1): per-batch durationMs
    // straight from the engine's progress events — addBatch (the foreachBatch
    // body: plan + execute + sink write) vs the harness overheads
    // (latestOffset/getBatch file-source listing, queryPlanning,
    // walCommit/commitOffsets checkpoint writes). This is the split the
    // stage listener can't see: stages only cover addBatch's jobs.
    if (sys.env.contains("PROF_STREAM")) {
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
          println(s"[prof] stream batch=${p.batchId} rows=${p.numInputRows} $d")
        }
      })
    }
    // Per-stage breakdown (PROF_STAGES=1): where a query's wall time lands —
    // scan vs exchange-read vs reduce — straight from the task-end stream.
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    if (sys.env.contains("PROF_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          // Prefer the first graft frame from the full callsite stack (the
          // short name is usually the SQL-execution thread wrapper).
          val graftFrame = s.stageInfo.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("Profile"))
            .map(_.trim.take(90))
          stageNames.put(s.stageInfo.stageId,
            graftFrame.getOrElse(s.stageInfo.name.takeWhile(_ != '\n').take(90)))
          ()
        }
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          println(s"[prof]   job ${j.jobId}: stages=${j.stageIds.mkString(",")} " +
            Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse(""))
        }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            val a = stages.computeIfAbsent(t.stageId, _ => new Array[Long](6))
            a.synchronized {
              a(0) += 1; a(1) += m.executorRunTime
              a(2) = math.max(a(2), m.executorRunTime)
              a(3) += m.shuffleReadMetrics.totalBytesRead
              a(4) += m.inputMetrics.bytesRead
              a(5) += m.executorCpuTime / 1000000L
            }
          }
        }
      })
    }
    def t(label: String)(f: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime(); f; println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (!stages.isEmpty) {
        Thread.sleep(300)
        stages.asScala.toSeq.sortBy(_._1).foreach { case (id, a) =>
          val nm = Option(stageNames.get(id)).getOrElse("")
          println(f"[prof]   stage $id%3d: tasks=${a(0)}%4d runSum=${a(1) / 1000.0}%7.1f s cpuSum=${a(5) / 1000.0}%7.1f s maxTask=${a(2) / 1000.0}%5.1f s shufRead=${a(3) / 1048576.0}%7.1f MB input=${a(4) / 1048576.0}%7.1f MB  $nm")
        }
      }
    }
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      t(s"$name run1") { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      t(s"$name run2") { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      if (sys.env.contains("PROF_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
