package graft

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.meta.Transition
import graft.streaming.StreamingDv

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val transitions = Seq(
    Transition("s", "id", "hub_user", "id_bk", "user", 1, raw = false, None, "bk"))

  test("streaming hub load is incremental and idempotent across micro-batches") {
    val root = tmpDir("stream")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val lake = new Lake(spark, root, buckets = 4)

    def runOnce(): Unit = {
      val staged = spark.readStream
        .schema("id LONG, name STRING")
        .parquet(srcDir)
      val q = StreamingDv.hubSink(
        lake, staged, transitions, "hub_user", "user",
        Seq("id" -> "id_bk"), "stream-test", s"$root/ckpt",
        graft.dv.HashGen.Md5)
      q.awaitTermination()
    }

    // The file-stream source lists only top-level files: flatten each batch's
    // part file directly into the watched directory.
    def addBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("id", "name").coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }

    addBatch("b1", Seq((1L, "ann"), (2L, "bob")))
    runOnce()
    assert(lake.read("dv", "hub_user").count() == 2)

    // Second batch overlaps the first: only the new key lands (anti-join),
    // and the already-seen file is not reprocessed (checkpoint).
    addBatch("b2", Seq((2L, "bob"), (3L, "cat")))
    runOnce()
    val hub = lake.read("dv", "hub_user")
    assert(hub.count() == 3)
    assert(hub.select("id_bk").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("windowedCounts: tumbling event-time windows (batch-equivalent semantics)") {
    val events = Seq(
      ("2026-01-01 00:00:10", "click"),
      ("2026-01-01 00:00:50", "click"),
      ("2026-01-01 00:01:10", "view")
    ).toDF("raw_ts", "event_type")
      .select(col("raw_ts").cast("timestamp").as("ts"), col("event_type"))
    val out = StreamingDv.windowedCounts(events, "ts", "1 minute", "10 minutes", "event_type")
    val rows = out.select("window_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().sortBy(r => (r._1.getTime, r._2))
    assert(rows.toSeq == Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "click", 2L),
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), "view", 1L)))
  }
}
