package graft

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.meta.Transition
import graft.streaming.StreamingDv

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val transitions = Seq(
    Transition("s", "id", "hub_user", "id_bk", "user", 1, raw = false, None, "bk"))

  test("multi-batch oracle replays drive >= 3 micro-batches with advancing run_ids") {
    // The single-batch streaming oracles pin everything into batch 0; these
    // two queries exist precisely to fold state ACROSS batch boundaries.
    // Pin that the generation staging really yields one batch per file:
    // run_id (= batchId) must span {0, 1, 2} in both results, and the sat's
    // re-versioned keys must carry the LATER batch's run_id.
    val dir = "/root/testdata/sf0.001"
    val hub = graft.queries.DvQueries.streamHubMulti(spark, dir)
      .select($"run_id".cast("long")).as[Long].collect()
    assert(hub.toSet == Set(0L, 1L, 2L), s"hub run_ids: ${hub.toSet}")
    val sat = graft.queries.DvQueries.streamSatMulti(spark, dir)
      .select($"customer_hk", $"run_id".cast("long")).as[(String, Long)].collect()
    assert(sat.map(_._2).toSet == Set(0L, 1L, 2L), s"sat run_ids: ${sat.map(_._2).toSet}")
    // every key has a batch-0 version; re-versioned keys stack later run_ids
    val byKey = sat.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byKey.values.forall(_.head == 0L))
    assert(byKey.values.exists(_ == Seq(0L, 1L)), "GEN1-only re-version missing")
    assert(byKey.values.exists(_ == Seq(0L, 1L, 2L)), "GEN1+GEN2 re-version missing")
    assert(byKey.values.exists(_ == Seq(0L)), "unchanged single-version keys missing")
  }

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

  test("streaming hub + sat sinks stay idempotent with the probe-prune gate FORCED OPEN") {
    // The wired readOrProbe path (bucket-pruned existing-table probe) under
    // real micro-batches: results must match the unpruned semantics —
    // anti-join dedup across batches, sat delta versioning — with the gate
    // at 0 so pruning engages even on this KB-sized vault.
    val root = tmpDir("streamprune")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val lake = new Lake(spark, root, buckets = 4)
    val satTransitions = transitions ++ Seq(
      Transition("s", "name", "hsat_user", "name", "user_details", 1, raw = false, None, "f"))
    def addBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("id", "name").coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val staged = spark.readStream.schema("id LONG, name STRING").parquet(srcDir)
      StreamingDv.hubSink(lake, staged, satTransitions, "hub_user", "user",
        Seq("id" -> "id_bk"), "t", s"$root/ckpt_hub", graft.dv.HashGen.Md5)
        .awaitTermination()
      val staged2 = spark.readStream.schema("id LONG, name STRING").parquet(srcDir)
      StreamingDv.satSink(lake, staged2, satTransitions, "hsat_user",
        hkSource = "user_hk", hashdiffField = "user_details_hashdiff",
        fields = Seq("name" -> "name"), satHk = "user_hk", "t", s"$root/ckpt_sat",
        graft.dv.HashGen.Md5)
        .awaitTermination()
    }
    try {
      spark.conf.set(graft.core.Confs.ProbePruneMinBytesKey, "0")
      addBatch("b1", Seq((1L, "ann"), (2L, "bob")))
      runOnce()
      // re-delivery + a change + a new key, pruned probes deciding all three
      addBatch("b2", Seq((1L, "ann"), (2L, "bobby"), (3L, "cat")))
      runOnce()
      val hub = lake.read("dv", "hub_user")
      assert(hub.select("id_bk").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      val sat = lake.read("dv", "hsat_user").select("name").as[String].collect().sorted.toSeq
      // ann once (unchanged re-delivery deduped), bob + bobby (versioned), cat once
      assert(sat == Seq("ann", "bob", "bobby", "cat"), sat)
    } finally spark.conf.unset(graft.core.Confs.ProbePruneMinBytesKey)
  }

  test("crash between append and checkpoint commit: restart replays the batch, vault equals a no-crash run (run_id included)") {
    // The crash-recovery proof (SURVEY §2 #16 posture): foreachBatch
    // re-delivers a batch whose append landed but whose commit-log entry
    // never did. The DV sinks' probes must make that replay EFFECTIVELY
    // idempotent — the recovered vault must be row-identical (audit columns
    // included) to a run that never crashed.
    val loadDts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val satTransitions = transitions ++ Seq(
      Transition("s", "name", "hsat_user", "name", "user_details", 1, raw = false, None, "f"))

    // two mtime-ordered files → two micro-batches under maxFilesPerTrigger=1;
    // batch 1 carries a re-delivery (1/ann), a changed payload (2/bobby) and
    // a new key (3/cat) — all three replay decisions exercised
    def mkSource(root: String): String = {
      val srcDir = s"$root/src"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
      val base = System.currentTimeMillis() - 3600000L
      def add(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
        val stage = s"$root/stage_$name"
        rows.toDF("id", "name").coalesce(1).write.parquet(stage)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        val dst = java.nio.file.Paths.get(srcDir, s"$name.parquet")
        java.nio.file.Files.move(part, dst)
        assert(dst.toFile.setLastModified(mtime))
      }
      add("b0", Seq((1L, "ann"), (2L, "bob")), base)
      add("b1", Seq((1L, "ann"), (2L, "bobby"), (3L, "cat")), base + 60000L)
      srcDir
    }

    def staged(srcDir: String) = spark.readStream
      .schema("id LONG, name STRING").option("maxFilesPerTrigger", "1").parquet(srcDir)

    def hubOnce(lake: Lake, srcDir: String, ckpt: String) =
      StreamingDv.hubSink(lake, staged(srcDir), satTransitions, "hub_user", "user",
        Seq("id" -> "id_bk"), "crash-test", ckpt, graft.dv.HashGen.Md5,
        loadDts = Some(loadDts))
    def satOnce(lake: Lake, srcDir: String, ckpt: String) =
      StreamingDv.satSink(lake, staged(srcDir), satTransitions, "hsat_user",
        hkSource = "user_hk", hashdiffField = "user_details_hashdiff",
        fields = Seq("name" -> "name"), satHk = "user_hk", "crash-test", ckpt,
        graft.dv.HashGen.Md5, loadDts = Some(loadDts))

    def crashOn(table: String): Unit = {
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      StreamingDv.afterAppendHook = (t, b) =>
        if (t == table && b == 1L && armed.getAndSet(false))
          throw new RuntimeException(s"injected crash after $t batch $b append")
    }
    def commitExists(ckpt: String, batch: Long): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt, "commits", batch.toString))

    val crashRoot = tmpDir("crashrun")
    val crashLake = new Lake(spark, crashRoot, buckets = 4)
    val crashSrc = mkSource(crashRoot)
    try {
      // ---- hub: crash on batch 1 after its append landed ----
      crashOn("hub_user")
      val eh = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        hubOnce(crashLake, crashSrc, s"$crashRoot/ckpt_hub").awaitTermination())
      assert(eh.getMessage.contains("injected crash"))
      // the window is real: append durable (all 3 keys), batch 1 uncommitted
      assert(crashLake.read("dv", "hub_user").count() == 3)
      assert(commitExists(s"$crashRoot/ckpt_hub", 0) && !commitExists(s"$crashRoot/ckpt_hub", 1))
      // restart from the checkpoint: batch 1 replays, anti-join dedups
      hubOnce(crashLake, crashSrc, s"$crashRoot/ckpt_hub").awaitTermination()
      assert(commitExists(s"$crashRoot/ckpt_hub", 1))

      // ---- satellite: same crash window ----
      crashOn("hsat_user")
      val es = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        satOnce(crashLake, crashSrc, s"$crashRoot/ckpt_sat").awaitTermination())
      assert(es.getMessage.contains("injected crash"))
      // batch-1 versions landed (bobby, cat) before the "crash"
      assert(crashLake.read("dv", "hsat_user").count() == 4)
      assert(!commitExists(s"$crashRoot/ckpt_sat", 1))
      satOnce(crashLake, crashSrc, s"$crashRoot/ckpt_sat").awaitTermination()
    } finally StreamingDv.afterAppendHook = (_, _) => ()

    // ---- the no-crash control run ----
    val cleanRoot = tmpDir("cleanrun")
    val cleanLake = new Lake(spark, cleanRoot, buckets = 4)
    val cleanSrc = mkSource(cleanRoot)
    hubOnce(cleanLake, cleanSrc, s"$cleanRoot/ckpt_hub").awaitTermination()
    satOnce(cleanLake, cleanSrc, s"$cleanRoot/ckpt_sat").awaitTermination()

    // row-identical vaults, audit columns included (run_id = replayed batchId)
    def rowsOf(lake: Lake, table: String): Seq[String] =
      lake.read("dv", table).drop("hk_bucket").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rowsOf(crashLake, "hub_user") == rowsOf(cleanLake, "hub_user"))
    assert(rowsOf(crashLake, "hsat_user") == rowsOf(cleanLake, "hsat_user"))
    // and the recovered sat state is the expected 4 versions with batch ids
    val sat = crashLake.read("dv", "hsat_user")
      .select($"name", $"run_id".cast("long")).as[(String, Long)].collect().sorted.toSeq
    assert(sat == Seq(("ann", 0L), ("bob", 0L), ("bobby", 1L), ("cat", 1L)), sat)
  }

  test("statePartitions sizes the micro-batch plans without changing results") {
    val root = tmpDir("sizedstream")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val lake = new Lake(spark, root, buckets = 4)

    Seq((1L, "ann"), (2L, "bob"), (3L, "cat")).toDF("id", "name")
      .coalesce(1).write.parquet(s"$root/stage")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/stage"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, "b1.parquet"))

    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val staged = spark.readStream.schema("id LONG, name STRING").parquet(srcDir)
    val q = StreamingDv.hubSink(
      lake, staged, transitions, "hub_user", "user",
      Seq("id" -> "id_bk"), "stream-test", s"$root/ckpt",
      graft.dv.HashGen.Md5, statePartitions = Some(2))
    q.awaitTermination()

    val hub = lake.read("dv", "hub_user")
    assert(hub.count() == 3)
    assert(hub.select("id_bk").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // scoped to the stream's cloned session — the caller's conf is untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("streaming satellite load versions changed payloads, skips unchanged") {
    val root = tmpDir("satstream")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val lake = new Lake(spark, root, buckets = 4)
    val transitions = Seq(
      Transition("s", "id", "hub_user", "id_bk", "user", 1, raw = false, None, "bk"),
      Transition("s", "name", "hsat_user", "name", "user_details", 1, raw = false, None, "f"))

    def addBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("id", "name").coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val staged = spark.readStream.schema("id LONG, name STRING").parquet(srcDir)
      val q = StreamingDv.satSink(
        lake, staged, transitions, "hsat_user",
        hkSource = "user_hk", hashdiffField = "user_details_hashdiff",
        fields = Seq("name" -> "name"), satHk = "user_hk",
        recordSource = "stream-test", checkpoint = s"$root/ckpt",
        algo = graft.dv.HashGen.Md5)
      q.awaitTermination()
    }

    addBatch("b1", Seq((1L, "ann"), (2L, "bob")))
    runOnce()
    assert(lake.read("dv", "hsat_user").count() == 2)

    // batch 2: unchanged bob (skipped), changed ann (new version), new cat.
    addBatch("b2", Seq((1L, "ann2"), (2L, "bob"), (3L, "cat")))
    runOnce()
    val sat = lake.read("dv", "hsat_user")
    assert(sat.count() == 4)
    assert(sat.filter(col("name") === "bob").count() == 1) // no duplicate version
    assert(sat.groupBy("user_hk").count().filter(col("count") === 2).count() == 1) // ann has 2 versions
  }

  test("streaming link load matches batch backfill and dedups across micro-batches") {
    val root = tmpDir("linkstream")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val lake = new Lake(spark, root, buckets = 4)
    val transitions = Seq(
      Transition("s", "cust_id", "hub_customer", "cust_id_bk", "customer", 1, raw = false, None, "bk"),
      Transition("s", "order_id", "hub_order", "order_id_bk", "order", 1, raw = false, None, "bk"),
      Transition("s", "customer", "link_order_customer", "customer_hk", "oc", 1, raw = false, None, "ll"),
      Transition("s", "order", "link_order_customer", "order_hk", "oc", 2, raw = false, None, "ll"),
      Transition("s", "channel", "link_order_customer", "channel_dk", "oc", 3, raw = false, None, "dk"))
    val legs = Seq("customer_hk" -> "customer_hk", "order_hk" -> "order_hk", "channel" -> "channel_dk")

    def addBatch(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("cust_id", "order_id", "channel").coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val staged = spark.readStream
        .schema("cust_id LONG, order_id LONG, channel STRING").parquet(srcDir)
      val q = StreamingDv.linkSink(
        lake, staged, transitions, "link_order_customer", "oc", legs,
        hkName = "order_customer_hk", recordSource = "stream-test",
        checkpoint = s"$root/ckpt", algo = graft.dv.HashGen.Md5)
      q.awaitTermination()
    }

    val b1 = Seq((1L, 10L, "web"), (2L, 20L, "app"))
    val b2 = Seq((2L, 20L, "app"), (3L, 30L, "web")) // overlaps b1: only one new link
    addBatch("b1", b1)
    runOnce()
    assert(lake.read("dv", "link_order_customer").count() == 2)
    addBatch("b2", b2)
    runOnce()
    val streamed = lake.read("dv", "link_order_customer")
    assert(streamed.count() == 3)

    // Batch backfill over the full input produces identical vault state
    // (modulo the audit columns, which legitimately differ per micro-batch).
    val backfill = graft.dv.DvOps.newLinkRows(
      graft.dv.HashView.build((b1 ++ b2).toDF("cust_id", "order_id", "channel"), transitions, graft.dv.HashGen.Md5),
      streamed.limit(0), "oc", legs, "order_customer_hk",
      graft.dv.LoadContext(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "backfill", 1L))
    val keyCols = Seq("order_customer_hk", "customer_hk", "order_hk", "channel_dk")
    assert(
      streamed.select(keyCols.map(col): _*).collect().map(_.toSeq).toSet ==
        backfill.select(keyCols.map(col): _*).collect().map(_.toSeq).toSet)
  }

  test("link sink crash between append and checkpoint commit: replay is idempotent (completes the sink-family proof)") {
    // hub + sat are covered by the crash test above; the link sink's
    // replay safety rests on the same anti-join but over composite legs +
    // degenerate keys — pin it so the StreamingDv doc's "all three DV
    // sinks" claim is tested, not asserted.
    val loadDts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val linkTransitions = Seq(
      Transition("s", "cust_id", "hub_customer", "cust_id_bk", "customer", 1, raw = false, None, "bk"),
      Transition("s", "order_id", "hub_order", "order_id_bk", "order", 1, raw = false, None, "bk"),
      Transition("s", "customer", "link_order_customer", "customer_hk", "oc", 1, raw = false, None, "ll"),
      Transition("s", "order", "link_order_customer", "order_hk", "oc", 2, raw = false, None, "ll"),
      Transition("s", "channel", "link_order_customer", "channel_dk", "oc", 3, raw = false, None, "dk"))
    val legs = Seq("customer_hk" -> "customer_hk", "order_hk" -> "order_hk", "channel" -> "channel_dk")

    def mkSource(root: String): String = {
      val srcDir = s"$root/src"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
      val base = System.currentTimeMillis() - 3600000L
      def add(name: String, rows: Seq[(Long, Long, String)], mtime: Long): Unit = {
        val stage = s"$root/stage_$name"
        rows.toDF("cust_id", "order_id", "channel").coalesce(1).write.parquet(stage)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        val dst = java.nio.file.Paths.get(srcDir, s"$name.parquet")
        java.nio.file.Files.move(part, dst)
        assert(dst.toFile.setLastModified(mtime))
      }
      add("b0", Seq((1L, 10L, "web"), (2L, 20L, "app")), base)
      // batch 1: one re-delivery, one new relationship
      add("b1", Seq((2L, 20L, "app"), (3L, 30L, "web")), base + 60000L)
      srcDir
    }
    def linkOnce(lake: Lake, srcDir: String, ckpt: String) =
      StreamingDv.linkSink(lake,
        spark.readStream.schema("cust_id LONG, order_id LONG, channel STRING")
          .option("maxFilesPerTrigger", "1").parquet(srcDir),
        linkTransitions, "link_order_customer", "oc", legs,
        hkName = "order_customer_hk", recordSource = "crash-test", checkpoint = ckpt,
        algo = graft.dv.HashGen.Md5, loadDts = Some(loadDts))

    val crashRoot = tmpDir("linkcrash")
    val crashLake = new Lake(spark, crashRoot, buckets = 4)
    val crashSrc = mkSource(crashRoot)
    try {
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      StreamingDv.afterAppendHook = (t, b) =>
        if (t == "link_order_customer" && b == 1L && armed.getAndSet(false))
          throw new RuntimeException(s"injected crash after $t batch $b append")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        linkOnce(crashLake, crashSrc, s"$crashRoot/ckpt").awaitTermination())
      assert(e.getMessage.contains("injected crash"))
      assert(crashLake.read("dv", "link_order_customer").count() == 3) // batch-1 append landed
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$crashRoot/ckpt", "commits", "1")))
      linkOnce(crashLake, crashSrc, s"$crashRoot/ckpt").awaitTermination()
    } finally StreamingDv.afterAppendHook = (_, _) => ()

    val cleanRoot = tmpDir("linkclean")
    val cleanLake = new Lake(spark, cleanRoot, buckets = 4)
    linkOnce(cleanLake, mkSource(cleanRoot), s"$cleanRoot/ckpt").awaitTermination()

    def rowsOf(lake: Lake): Seq[String] =
      lake.read("dv", "link_order_customer").drop("hk_bucket").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rowsOf(crashLake) == rowsOf(cleanLake))
    assert(rowsOf(crashLake).length == 3)
  }

  test("sessionize: a late-but-in-watermark event merges into a session a newer event had already 'closed'") {
    // The old shape emitted a session the moment a newer event opened the
    // next one — before the watermark had passed end+gap — so a late event
    // landing inside it could never merge (Append mode cannot retract) and
    // the stream diverged from the batch twin: three 1-event sessions
    // instead of [10:00–10:10](2) + [10:30](1). Finality must be the
    // watermark's.
    val root = tmpDir("sess_late")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def addBatch(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("user_id", "raw_ts", "event_id")
        .select(col("user_id"), col("raw_ts").cast("timestamp").as("ts"), col("event_id"))
        .coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    val emittedBuf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamingDv.SessionOut])
    def runOnce(): Unit = {
      val events = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_id LONG").parquet(srcDir)
      val q = StreamingDv.sessionize(events, gapMinutes = 15, delayThreshold = "1 hour")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingDv.SessionOut], _: Long) =>
          batch.collect().foreach(emittedBuf.add)
          ()
        }
        .start()
      q.awaitTermination()
    }
    // batch 1: 10:00 and 10:30 — 30 min apart (> 15 min gap), but the
    // watermark (10:30 − 1 h) hasn't passed 10:00+gap, so NOTHING is final
    addBatch("b1", Seq((1L, "2026-01-01 10:00:00", 1L), (1L, "2026-01-01 10:30:00", 2L)))
    runOnce()
    assert(emittedBuf.isEmpty, s"premature emission: $emittedBuf")
    // batch 2: the LATE event 10:10 (admissible: ≥ 09:30 watermark) must
    // merge into [10:00]; the 13:00 event advances the watermark to 12:00,
    // finalizing both early sessions
    addBatch("b2", Seq((1L, "2026-01-01 10:10:00", 3L), (1L, "2026-01-01 13:00:00", 4L)))
    runOnce()
    import scala.jdk.CollectionConverters._
    val out = emittedBuf.asScala.toVector.sortBy(_.session_start.getTime)
      .map(s => (s.n_events, s.session_start.toString, s.session_end.toString))
    assert(out == Vector(
      (2L, "2026-01-01 10:00:00.0", "2026-01-01 10:10:00.0"),
      (1L, "2026-01-01 10:30:00.0", "2026-01-01 10:30:00.0")), out)
  }

  test("sessionize: gap sessions close across micro-batches with bounded state") {
    val root = tmpDir("sess")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))

    def addBatch(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("user_id", "raw_ts", "event_id")
        .select(col("user_id"), col("raw_ts").cast("timestamp").as("ts"), col("event_id"))
        .coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }

    // memory sink can't recover from a checkpoint; collect via foreachBatch.
    val emittedBuf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamingDv.SessionOut])
    def emitted: Vector[StreamingDv.SessionOut] = {
      import scala.jdk.CollectionConverters._
      emittedBuf.asScala.toVector.sortBy(s => (s.session_start.getTime, s.user_id))
    }
    def runOnce(): Unit = {
      val events = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_id LONG")
        .parquet(srcDir)
      val q = StreamingDv.sessionize(events, gapMinutes = 30, delayThreshold = "30 minutes")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingDv.SessionOut], _: Long) =>
          batch.collect().foreach(emittedBuf.add)
          ()
        }
        .start()
      q.awaitTermination()
    }

    // Batch 1: one 2-event session then a lone event starting a new session.
    addBatch("b1", Seq(
      (1L, "2026-01-01 10:00:00", 1L),
      (1L, "2026-01-01 10:10:00", 2L),
      (1L, "2026-01-01 12:00:00", 3L)))
    runOnce()
    assert(emitted.map(s => (s.user_id, s.n_events)) == Vector((1L, 2L)), emitted)
    assert(emitted.head.session_start == java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))
    assert(emitted.head.session_end == java.sql.Timestamp.valueOf("2026-01-01 10:10:00"))

    // Batch 2: a much later event closes the 12:00 session.
    addBatch("b2", Seq((1L, "2026-01-01 13:30:00", 4L)))
    runOnce()
    assert(emitted.map(s => (s.n_events, s.session_start.toString.substring(11, 16))) ==
      Vector((2L, "10:00"), (1L, "12:00")))
  }

  test("windowedCounts runs as a real stream with watermark (update mode)") {
    val root = tmpDir("wc")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val stage = s"$root/stage"
    Seq(("2026-01-01 00:00:10", "click"), ("2026-01-01 00:00:50", "click"), ("2026-01-01 00:01:10", "view"))
      .toDF("raw_ts", "event_type")
      .select(col("raw_ts").cast("timestamp").as("ts"), col("event_type"))
      .coalesce(1).write.parquet(stage)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(srcDir, "b1.parquet"))

    val events = spark.readStream.schema("ts TIMESTAMP, event_type STRING").parquet(srcDir)
    val q = StreamingDv.windowedCounts(events, "ts", "1 minute", "10 minutes", "event_type")
      .writeStream.format("memory").queryName("wc_out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("wc_out").select("window_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().sortBy(r => (r._1.getTime, r._2))
    assert(rows.toSeq == Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "click", 2L),
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), "view", 1L)))
  }

  test("watermark-bounded dedup: duplicates inside the horizon drop, state past it is EVICTED (bounded)") {
    // The 100 TB posture for unbounded dedup keys: state lives only inside
    // the watermark horizon. Observable: a key re-delivered with a fresh
    // in-horizon timestamp AFTER its state expired is re-emitted (the state
    // row is provably gone), while a key whose state is still live dedups.
    val root = tmpDir("wmdedup")
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def writeGen(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("event_id", "raw_ts")
        .select(col("event_id"), col("raw_ts").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val dst = java.nio.file.Paths.get(srcDir, s"$name.parquet")
      java.nio.file.Files.move(part, dst)
      assert(dst.toFile.setLastModified(mtime)) // file source replays in mtime order
    }
    val base = System.currentTimeMillis() - 3600000L
    // gen0: key 1 early, key 2 two hours later. Horizon 10 min ⇒ the
    // watermark advances to 01:50 for batch 1, whose END-of-batch eviction
    // drops key 1's state (expiry 00:10) and keeps key 2's (expiry 02:10).
    // Eviction runs AFTER a batch's probe, so the re-delivery must arrive
    // one batch later — gen1 is a fresh-key spacer batch.
    writeGen("g0", base, Seq(
      (1L, "2026-01-01 00:00:00"),
      (2L, "2026-01-01 02:00:00")))
    writeGen("g1", base + 60000L, Seq(
      (3L, "2026-01-01 02:00:00")))
    // gen2: keys 1 and 2 re-delivered AT 02:00 (above the 01:50 watermark,
    // not late): key 1 re-emits (state evicted), key 2 dedups (state live).
    writeGen("g2", base + 120000L, Seq(
      (1L, "2026-01-01 02:00:00"),
      (2L, "2026-01-01 02:00:00")))
    val events = spark.readStream.schema("event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("wm_dedup_out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("wm_dedup_out")
      .as[(Long, java.sql.Timestamp)].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    assert(rows == Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00")), // the eviction proof: key 1 re-emitted
      (2L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00")),
      (3L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"))),
      rows)
    // and the state store itself reports the eviction: at least one state
    // row was REMOVED by the watermark (plain dropDuplicates never removes)
    val removed = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed >= 1L, s"expected watermark eviction, numRowsRemoved=$removed")
  }

  test("events_stream_dedup_wm equals batch DISTINCT across re-delivered generations") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.DvQueries.streamEventsDedupWm(spark, dir)
    val expected = graft.core.Tables.loadEvents(spark, dir).count()
    assert(out.count() == expected, "first-sights must equal the distinct event set")
    assert(out.select("event_id").distinct().count() == expected, "no re-delivered duplicate survives")
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
