package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-batch decomposition of the streaming replay rows (r21 verdict #4):
  * runs named streaming queries from SparkEntry under a
  * StreamingQueryListener and prints, per rep and per micro-batch, the
  * engine's own durationMs split (addBatch = the batch plan's execution,
  * getBatch/latestOffset = source listing, walCommit/commitOffsets = the
  * checkpoint log, queryPlanning) plus state-store commit time and rows —
  * separating fixed per-batch machinery from real join/agg work. Wall
  * clock per rep is also printed so listener totals can be checked against
  * the bench's number. Not part of the library surface. */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    require(args.nonEmpty, "usage: ProfStream <query> [query ...]")
    val spark: SparkSession = graft.core.Sessions.localBuilder(cpus, cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        def d(k: String): Long = Option(dm.get(k)).map(_.longValue).getOrElse(-1L)
        val st = p.stateOperators.toSeq.map { so =>
          s"""{"op":"${so.operatorName}","commitMs":${so.commitTimeMs},"rowsTotal":${so.numRowsTotal},"rowsUpdated":${so.numRowsUpdated},"memMB":${so.memoryUsedBytes / 1048576}}"""
        }.mkString("[", ",", "]")
        events.add(
          s"""{"batch":${p.batchId},"rows":${p.numInputRows},"trigger":${d("triggerExecution")},"addBatch":${d("addBatch")},"getBatch":${d("getBatch")},"latestOffset":${d("latestOffset")},"planning":${d("queryPlanning")},"walCommit":${d("walCommit")},"commitOffsets":${d("commitOffsets")},"state":$st}""")
      }
    }
    spark.streams.addListener(listener)

    // warmup (page cache + codegen first-hit), untimed
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()

    for (q <- args.toSeq) {
      val fn = graft.SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
      for (rep <- 1 to reps) {
        events.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"PROFSTREAM query=$q rep=$rep wall=$wall%.3f")
        events.forEach(j => println(s"  $j"))
        System.out.flush()
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
